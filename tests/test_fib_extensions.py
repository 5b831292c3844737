"""FIG 0/6, 0/8, 0/9, 0/16, 0/18, 0/19 parser coverage (hand-built FIGs
through the FIB byte path)."""

from dabjax.fic.fib import EnsembleDB
from dabjax.tx.fig import _FigWriter, _fig0_header


def _fib_with(figs):
    body = b"".join(figs)
    assert len(body) <= 30
    return body + b"\xff" * (30 - len(body))


def test_fig0_9_lto():
    w = _FigWriter()
    _fig0_header(w, 9)
    w.u(0, 2)    # ext/rfa
    w.u(1, 1)    # LTO sign (negative)
    w.u(3, 4)    # 3 half-hours
    w.u(0, 1)    # ensemble LTO only
    w.u(0, 16)   # ECC + international table
    db = EnsembleDB()
    db.process_fib_bytes(_fib_with([w.to_fig(0)]))
    assert db.lto_halfhours == -3


def test_fig0_16_pnum():
    w = _FigWriter()
    _fig0_header(w, 16)
    w.u(0x4001, 16)    # SId
    w.u(0x1234, 16)    # PNum
    w.u(0, 8)          # flags
    w.u(0, 32)         # padding to the 72-bit stride
    db = EnsembleDB()
    db.process_fib_bytes(_fib_with([w.to_fig(0)]))
    assert db.services[0x4001].pnum == 0x1234


def test_fig0_18_announcement_support():
    w = _FigWriter()
    _fig0_header(w, 18)
    w.u(0x4002, 16)    # SId
    w.u(0x0003, 16)    # ASu flags (alarm + traffic)
    w.u(0, 3)          # rfa
    w.u(1, 5)          # one cluster
    w.u(7, 8)          # cluster id 7
    db = EnsembleDB()
    db.process_fib_bytes(_fib_with([w.to_fig(0)]))
    assert db.announcements[0x4002] == 0x0003


def test_fig0_19_announcement_switching():
    w = _FigWriter()
    _fig0_header(w, 19)
    w.u(7, 8)          # cluster id
    w.u(0x0002, 16)    # ASw flags
    w.u(1, 1)          # new flag
    w.u(0, 1)          # region flag = 0
    w.u(9, 6)          # subchannel 9
    db = EnsembleDB()
    db.process_fib_bytes(_fib_with([w.to_fig(0)]))
    assert db.active_announcements[7] == (0x0002, 9)


def test_fig0_6_and_8_skip_cleanly():
    # 0/6: one short entry (id list flag 0)
    w6 = _FigWriter()
    _fig0_header(w6, 6)
    w6.u(0, 1)     # id list flag
    w6.u(1, 1)     # LA
    w6.u(0, 1)     # S/H
    w6.u(0, 1)     # ILS
    w6.u(0x123, 12)
    # 0/8: one audio-stream entry
    w8 = _FigWriter()
    _fig0_header(w8, 8)
    w8.u(0x4003, 16)   # SId
    w8.u(0, 1)         # ext flag
    w8.u(0, 3)         # rfa
    w8.u(0, 4)         # SCIdS
    w8.u(0, 8)         # rfa byte (parser reads ls flag one byte later)
    w8.u(0, 1)         # ls flag = 0 (subchannel form)
    w8.u(0, 1)         # MSC flag
    w8.u(5, 6)         # subch 5
    db = EnsembleDB()
    db.process_fib_bytes(_fib_with([w6.to_fig(0), w8.to_fig(0)]))
    assert 0x123 in db.linkage_sets


def test_fig1_3_region_label():
    from dabjax.tx.fig import fig1_3
    db = EnsembleDB()
    db.process_fib_bytes(_fib_with([fig1_3(0x2A, "NORTH REGION")]))
    assert db.region_labels[0x2A].strip() == "NORTH REGION"


def test_fig1_4_component_label():
    from dabjax.tx.fig import fig1_4
    db = EnsembleDB()
    db.process_fib_bytes(_fib_with([fig1_4(0x4001, 2, "SECONDARY")]))
    assert db.component_labels[(0x4001, 2)].strip() == "SECONDARY"
    # 32-bit (pd=1) identifier variant
    db2 = EnsembleDB()
    db2.process_fib_bytes(_fib_with([fig1_4(0xE1C00042, 1, "DATA COMP",
                                            pd=1)]))
    assert db2.component_labels[(0xE1C00042, 1)].strip() == "DATA COMP"


def test_fig1_6_xpad_label():
    from dabjax.tx.fig import fig1_6
    db = EnsembleDB()
    db.process_fib_bytes(_fib_with([fig1_6(0x4001, 0, 12, "SLIDESHOW")]))
    assert db.xpad_labels[(0x4001, 0, 12)].strip() == "SLIDESHOW"
    db2 = EnsembleDB()
    db2.process_fib_bytes(_fib_with([fig1_6(0xE1C00042, 3, 16, "EPG XPAD",
                                            pd=1)]))
    assert db2.xpad_labels[(0xE1C00042, 3, 16)].strip() == "EPG XPAD"


def test_fig2_labels():
    """FIG type 2 labels in the reference's layout route through the same
    handler (fib-processor.cpp:998-1037)."""
    from dabjax.tx.fig import fig2_label
    db = EnsembleDB()
    db.process_fib_bytes(_fib_with([fig2_label(1, 0x4009, "TWO RADIO")]))
    db.process_fib_bytes(_fib_with([fig2_label(5, 0xE1C00099, "TWO DATA",
                                               sid_bits=32)]))
    assert db.services[0x4009].label.strip() == "TWO RADIO"
    assert db.services[0xE1C00099].label.strip() == "TWO DATA"
