"""Archived experiments — working, tested code that LOST its benchmark A/B
and is kept for the measurement record (BENCHMARKS.md), not for production.

- blocked.py: block-packed XLA conv restructuring (~6% slower than plain
  XLA convs end-to-end).
- resunit_kernel.py: per-tap fused Pallas residual stacks (1/16 MXU lane
  utilization; superseded by ops/pallas/folded_stack.py).
- vq_kernel.py: Pallas RVQ argmin kernel (XLA's fused distance matmul is
  already free alongside the conv stacks on the inference path).
- fast_experiments.py: encoder/decoder wrappers over the above.

Nothing here is exported from audiodec_tpu.ops; production fast paths live
in models/fast.py (folded stacks) and ops/.
"""
