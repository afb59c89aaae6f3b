"""Measurement harnesses behind docs/PERF.md.

Every probe is an executable module: ``python -m bench.<probe>``. Shared
relay-safe timing lives in bench.timing — in this environment every jitted
call crosses a remote PJRT relay with a fixed dispatch+fetch round trip, so
naive fixed-iteration-count timing inflates per-iter numbers (the round-2
"118 TFLOP/s practical ceiling" artifact, corrected in round 3 by
bench.ceiling2). All steady-state numbers here are slope-fits over several
iteration counts, which cancel any per-call overhead exactly.

The driver-facing benchmark contract stays at the repo root: ``bench.py``
(one JSON line). Python resolves ``import bench`` to this package (packages
shadow same-named modules), while ``python bench.py`` still executes the
root file directly.
"""
