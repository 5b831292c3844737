"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Verifies the SPMD full-ensemble step (time x subch mesh, ppermute halos)
decodes bit-identically to the single-chip path on golden IQ.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dabjax.constants import get_mode
from dabjax.msc.cif import cifs_from_soft
from dabjax.msc.subchannel import EnsembleDecoder, SubchGeometry
from dabjax.ofdm import demod
from dabjax.parallel.mesh import make_mesh
from dabjax.parallel.sharding import (make_sharded_inputs,
                                      sharded_ensemble_step)
from dabjax.tx.fig import ServiceSpec
from dabjax.tx.modulator import Modulator

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

SERVICES = [
    ServiceSpec(label=f"SVC{i}", sid=0x7000 + i, subch_id=i,
                start_addr=i * 100, bitrate=96, protection="EEP-A",
                prot_level=3, kind="DAB+")
    for i in range(4)
]


def test_sharded_step_matches_single_chip():
    p = get_mode(1)
    mod = Modulator(mode=1, services=SERVICES)
    n_frames = 8          # 32 CIFs -> 16 CIFs per time shard
    iq = mod.iq(n_frames, snr_db=None)
    u0 = p.T_null + p.T_g
    need = demod.min_frame_samples(p)
    rows = np.stack([iq[u0 + f * p.T_F: u0 + f * p.T_F + need]
                     for f in range(n_frames)])

    # single-chip reference
    soft, _ = demod.demodulate_frames(jnp.asarray(rows), p)
    cifs = cifs_from_soft(soft, p)
    geoms = [SubchGeometry(s.subch_id, s.start_addr, s.length_cus,
                           s.bitrate, s.protection, s.prot_level)
             for s in SERVICES]
    single = EnsembleDecoder(geoms, p).decode(cifs)

    # sharded: mesh (time=2, subch=4)
    mesh = make_mesh(8, (2, 4))
    step = sharded_ensemble_step(mesh, p, geoms[0])
    starts = np.array([g.start_addr for g in geoms], np.int32)
    rows_d, starts_d = make_sharded_inputs(mesh, rows, starts)
    fic_ratio, bits = jax.block_until_ready(step(rows_d, starts_d))
    assert float(fic_ratio) == 1.0

    bits = np.asarray(bits)     # [4, 32, 24*96]
    # single-chip output t covers CIF t+15 (31-15=17 frames); sharded output
    # covers all 32 CIFs with warm-up at t<15 and a halo-primed second shard.
    for i, g in enumerate(geoms):
        want = single[g.subch_id]           # [17, bits] for CIFs 15..31
        got = bits[i, 15:, :]
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"subch {g.subch_id}")
    # and the payloads are the modulator's
    for i, s in enumerate(SERVICES):
        for t in range(3):
            np.testing.assert_array_equal(
                bits[i, 15 + t], mod.payload_bits(s.subch_id, t))


class _Capture:
    """Records every routed logical frame (a stand-in service handler)."""

    def __init__(self):
        self.frames = []

    def add_logical_frame(self, bits):
        self.frames.append(np.asarray(bits).copy())


def test_receiver_mesh_product_path():
    """Receiver(mesh=...) — the PRODUCT multi-chip path: frames sharded
    across the mesh in the demod/FIC/PRS block, subchannels padded-to-bucket
    and sharded in the MSC decode.  Mixed geometries (two buckets, both
    smaller than the mesh) must decode bit-identically to single-chip."""
    from dabjax.io.sources import SyntheticSource
    from dabjax.runtime.config import ReceiverConfig
    from dabjax.runtime.receiver import Receiver

    specs = (
        [ServiceSpec(label=f"BIG{i}", sid=0x7100 + i, subch_id=i,
                     start_addr=i * 120, bitrate=96, protection="EEP-A",
                     prot_level=3, kind="DAB+") for i in range(2)]
        + [ServiceSpec(label=f"SML{i}", sid=0x7110 + i, subch_id=4 + i,
                       start_addr=400 + i * 40, bitrate=32,
                       protection="EEP-B", prot_level=3, kind="DAB+")
           for i in range(3)])

    def build():
        return SyntheticSource(Modulator(mode=1, services=specs),
                               snr_db=None, lead_in=300)

    def factory_for(store):
        return lambda db, subch_id: store.setdefault(subch_id, _Capture())

    cfg = ReceiverConfig(mode=1, frames_per_block=8, decode_audio=False,
                         decode_data=True)
    single, sharded = {}, {}
    r1 = Receiver(build(), cfg, data_handler_factory=factory_for(single))
    r1.run(2)
    r2 = Receiver(build(), cfg, data_handler_factory=factory_for(sharded),
                  mesh=make_mesh(8, (2, 4)))
    r2.run(2)
    assert r1.metrics.fic_ratio == 1.0, r1.metrics.dashboard()
    assert r2.metrics.fic_ratio == 1.0, r2.metrics.dashboard()
    assert set(single) == set(sharded) and len(single) == 5
    for k in single:
        a, b = single[k].frames, sharded[k].frames
        assert len(a) == len(b) > 0, (k, len(a), len(b))
        np.testing.assert_array_equal(np.stack(a), np.stack(b),
                                      err_msg=f"subch {k}")


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == args[0].shape[0]


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_multihost_channel_assignment():
    from dabjax.parallel.multihost import assign_channels
    chans = ["12C", "5A", "7D", "11B", "13F"]
    a0 = assign_channels(chans, 2, 0)
    a1 = assign_channels(chans, 2, 1)
    assert sorted(a0 + a1) == sorted(chans)
    assert not set(a0) & set(a1)
    # single process owns everything; init is a no-op
    assert assign_channels(chans, 1, 0) == sorted(chans)


def test_multihost_run_channels_local():
    import numpy as np
    from dabjax.parallel.multihost import run_channels
    from dabjax.io.sources import SyntheticSource
    from dabjax.runtime.config import ReceiverConfig
    from dabjax.tx.fig import ServiceSpec
    from dabjax.tx.modulator import Modulator

    def factory():
        svc = [ServiceSpec(label="MH", sid=0x7001, subch_id=1, start_addr=0,
                           bitrate=32, protection="EEP-B", prot_level=3,
                           kind="DAB+")]
        return SyntheticSource(Modulator(mode=2, services=svc), snr_db=30.0)

    metrics = run_channels({"12C": factory, "5A": factory}, n_blocks=2,
                           receiver_config=ReceiverConfig(
                               mode=2, frames_per_block=4,
                               decode_audio=False, decode_data=False))
    assert set(metrics) == {"12C", "5A"}
    for m in metrics.values():
        assert m.synced and m.fic_ratio > 0.9
