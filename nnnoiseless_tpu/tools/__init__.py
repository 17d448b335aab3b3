"""Developer tools: parity checking, profiling, micro-benchmarks.

Counterparts of the reference's examples/benches (examples/corr.rs,
benches/sin.rs) plus TPU-side profiling that the reference has no analogue
for (SURVEY.md §5: tracing/profiling — none in-tree upstream).
"""
