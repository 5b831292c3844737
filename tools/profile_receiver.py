"""Attribute the product Receiver.run() wall time (VERDICT r4 weak #2).

Runs the receiver_realtime bench config under cProfile and prints the
top cumulative-time functions, plus a coarse stage attribution.
"""
import cProfile, pstats, io, sys, time
sys.path.insert(0, "/root/repo")

import numpy as np
import bench as B
from dabjax.runtime.config import ReceiverConfig
from dabjax.runtime.receiver import Receiver

mixed = B._bench_services("mixed")
iq = B._make_loop_iq(mixed)
cfg = ReceiverConfig(frames_per_block=16, decode_audio=True, decode_data=True)
rx = Receiver(B._LoopSource(iq), cfg)
rx.run(3)  # compile + warm

pr = cProfile.Profile()
t0 = time.perf_counter()
pr.enable()
rx.run(8)
pr.disable()
dt = time.perf_counter() - t0
p = rx.p
sig = 8 * cfg.frames_per_block * p.T_F / 2_048_000
print(f"wall={dt:.2f}s signal={sig:.2f}s rt={sig/dt:.2f}x")
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(45)
print(s.getvalue())
