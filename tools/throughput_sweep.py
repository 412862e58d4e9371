"""Batch-size throughput sweep: train-step pairs/s and MFU vs batch size.

The reference recipe trains at batch 16 (configs/DrugLAMP.yaml SOLVER), where
the MXU is latency- and bandwidth-bound (~20% MFU measured).  This sweep
shows the chip's headroom for production/serving deployments that are free
to batch larger: the same jitted scanned train step
(train.steps.make_repeat_step — execution proved via the optimizer step
counter, bench.py) at batch 16/32/64/128.

    PYTHONPATH=.:/root/.axon_site python tools/throughput_sweep.py [bs ...]
"""

import math
import sys
import time

TRAIN_GFLOP_PER_PAIR = 25.5          # XLA-audited (tools/flop_audit.py);
                                     # batch-size-invariant per flop_audit
V5E_BF16_PEAK_TFLOPS = 197.0


def sweep(batch_size: int, iters: int = 128, reps: int = 4, cfg=None,
          **tier_kw) -> float:
    import jax
    import numpy as np

    import bench
    from druglamp_tpu.train.steps import make_repeat_step

    _, state, batch, args, model = bench.make_tier(
        "DrugLAMP", use_ssl=False, use_cm=False, cfg=cfg,
        batch_size=batch_size, **tier_kw)
    repeat = make_repeat_step(model, use_ssl=False, use_cm=False, iters=iters)

    step0 = int(np.asarray(state.step))
    rng = jax.random.key(7)
    rng, k = jax.random.split(rng)
    state, cls_l = repeat(state, batch, k, *args)
    float(np.asarray(cls_l)[-1])                     # warm + sync

    def run(n):
        nonlocal state, rng, cls_l
        t0 = time.perf_counter()
        for _ in range(n):
            rng, k = jax.random.split(rng)
            state, cls_l = repeat(state, batch, k, *args)
        last = float(np.asarray(cls_l)[-1])
        assert math.isfinite(last), last
        return time.perf_counter() - t0

    ta, tb = run(1), run(reps + 1)                   # two-point
    steps = int(np.asarray(state.step)) - step0
    assert steps == iters * (3 + reps), (steps, iters * (3 + reps))
    return batch_size * iters * reps / (tb - ta)


def main():
    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    sizes = [int(a) for a in sys.argv[1:]] or [16, 32, 64, 128]
    for bs in sizes:
        pps = sweep(bs)
        tf = pps * TRAIN_GFLOP_PER_PAIR / 1e3
        print(f"bs={bs:4d}: {pps:8.1f} pairs/s  {tf:6.1f} TF/s  "
              f"mfu={tf / V5E_BF16_PEAK_TFLOPS:.3f}", flush=True)


if __name__ == "__main__":
    main()
