"""Cross-host scaling: channels (ensembles) sharded over processes/DCN.

SURVEY.md §2.5's outermost axis: the reference tunes ONE channel at a
time and scans serially (``gui.cpp:561-638``); a multi-host deployment
decodes many Band III ensembles concurrently by assigning channels to
hosts.  Channels are embarrassingly parallel (independent RF), so the
right mapping is **independent per-host meshes over DCN-disjoint work**
— each process builds its local ``('time','subch')`` mesh over its own
chips and runs full receivers for its channel set; only metrics cross
host boundaries.  This is the deployment recipe behind BASELINE.md's
"two hosts >= 80% efficiency" target: zero inter-host communication in
the hot path makes scaling linear minus input-feed overheads.

Run one process per host:

    python -c "from dabjax.parallel.multihost import run_channels; ..."
    # proc 0:  run_channels({...}, coordinator='h0:1234', num_processes=2,
    #                        process_id=0)
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

__all__ = ["init_distributed", "assign_channels", "run_channels"]


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: int = 1, process_id: int = 0) -> None:
    """Initialize jax.distributed when running multi-process; no-op for a
    single process (the common one-host case)."""
    if num_processes <= 1 or coordinator is None:
        return
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def assign_channels(channels: Sequence[str], num_processes: int,
                    process_id: int) -> List[str]:
    """Round-robin channel -> process assignment (deterministic on every
    host, no coordination needed)."""
    return [c for i, c in enumerate(sorted(channels))
            if i % num_processes == process_id]


def run_channels(sources: Dict[str, Callable[[], object]],
                 n_blocks: int = 8,
                 coordinator: Optional[str] = None,
                 num_processes: int = 1, process_id: int = 0,
                 receiver_config=None,
                 concurrent: bool = True) -> Dict[str, object]:
    """Decode this host's share of ``sources`` ({channel: source factory}).

    Returns {channel: Metrics} for the locally-owned channels.  Factories
    (not live sources) are passed so only owned channels open hardware.

    ``concurrent``: decode this host's channels in parallel threads (the
    one-host BASELINE config-5 shape).  Device dispatches from the
    channel threads interleave on the local chips while each channel's
    host-side parsing (FIBs, audio, data) overlaps the others' device
    work; channels share compiled programs via jax's jit cache when
    their geometry matches.  ``concurrent=False`` restores serial decode
    (deterministic ordering for debugging)."""
    from dabjax.runtime.receiver import Receiver

    init_distributed(coordinator, num_processes, process_id)
    mine = assign_channels(list(sources), num_processes, process_id)
    out = {}
    if not concurrent or len(mine) <= 1:
        for chan in mine:
            rx = Receiver(sources[chan](), receiver_config)
            out[chan] = rx.run(n_blocks)
            rx.close()
        return out

    from concurrent.futures import ThreadPoolExecutor

    def one(chan):
        rx = Receiver(sources[chan](), receiver_config)
        m = rx.run(n_blocks)
        rx.close()
        return m

    with ThreadPoolExecutor(max_workers=len(mine)) as pool:
        futs = {chan: pool.submit(one, chan) for chan in mine}
        for chan, f in futs.items():
            out[chan] = f.result()
    return out
