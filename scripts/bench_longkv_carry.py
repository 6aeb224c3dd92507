"""Long-KV carry-kernel pipelining sweep (VERDICT r4 item 3).

Round 4's carry kernel ran the 576^2 ReferenceOnly concat-KV shape
(bh=96, sq=5184, sk=10368, d=40 — reference attention_processor.py:443-493)
at ~34.7 TF/s vs the resident unroll kernel's 47 TF/s on identical work:
with the swept-best (3, 3456, 3456) plan each grid step was ONE serialized
QK^T -> softmax -> PV chain, so the VPU softmax sat exposed on the critical
path (~29% of step time by the MXU/VPU cost model).

This sweep measures the two round-5 pipelining levers:
  * register-carried (m, l, acc) across KV sub-blocks within a part
    (scratch round-trip only at part boundaries) — lets Mosaic overlap
    sub-block j+1's QK^T with sub-block j's softmax, the unroll kernel's
    schedule;
  * n_qsub independent q register-state chunks — chunk B's QK^T hides
    chunk A's softmax even at one KV sub-block per part.

Run on the axon TPU env:  python scripts/bench_longkv_carry.py
"""

import itertools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from musev_tpu.ops.pallas import flash_attention as fa  # noqa: E402


from _bench_util import sync, timeit, chip_canary  # noqa: E402


def main():
    assert jax.default_backend() == "tpu", "run on the TPU (axon) env"
    bh, sq, sk, d = 96, 5184, 10368, 40
    if len(sys.argv) > 1:
        bh, sq, sk, d = (int(x) for x in sys.argv[1:5])
    dt = jnp.bfloat16
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (bh, sq, d), dt)
    k = jax.random.normal(kk, (bh, sk, d), dt)
    v = jax.random.normal(kv, (bh, sk, d), dt)
    scale = d**-0.5
    flops = 4 * bh * sq * sk * d

    # chip-speed canary so sweeps from different sessions compare
    x = jax.random.normal(kq, (4096, 4096), dt)
    mm = jax.jit(lambda a: a @ a)
    t = timeit(mm, x)
    print(f"canary 4096^3 bf16: {2 * 4096**3 / t / 1e12:.1f} TF/s",
          flush=True)

    def run(bq, part, sub, n_qsub):
        sq_p = fa._cdiv(sq, bq) * bq
        qb = fa._pad_rows(q, sq_p)
        n_parts = fa._cdiv(sk, part)
        sk_p = n_parts * part
        kb = fa._pad_rows(k, sk_p)
        vb = fa._pad_rows(v, sk_p)
        return timeit(
            fa._flash_carry, qb, kb, vb, float(scale), int(bq), int(sub),
            int(part), int(sk), n_qsub=int(n_qsub),
        )

    print(f"shape bh={bh} sq={sq} sk={sk} d={d}", flush=True)
    # K/V HBM refetch scales with ceil(sq_p/bq): wide q blocks cut the
    # dominant DMA term (9 sweeps at bq=576 = 4.6 GB/call at this shape),
    # inner q chunks (n_qsub) keep the logits tile and register set small.
    # Hand-pruned list — tunnel compiles are minutes each.
    # VMEM constraint (measured): Mosaic does NOT reuse the fp32 logits
    # buffers across the unrolled sub-blocks of a part, so scoped vmem
    # scales as ~4*part*bq bytes regardless of sub ((1728,3456,864) asked
    # for 21.09M; (864,3456,864) fits). Wide bq therefore needs a SHORT
    # part (more parts, same K/V traffic, same total logits).
    configs = [
        (576, 3456, 3456, 1),    # round-4 baseline plan
        (576, 3456, 3456, 2),    # first-sweep best
        (864, 3456, 3456, 1),
        (864, 3456, 864, 2),
        (1728, 1152, 1152, 2),
        (1728, 1152, 576, 2),
        (1728, 1152, 576, 3),
        (2592, 864, 864, 3),
        (2592, 768, 768, 3),
    ]
    rows = []
    for bq, part, sub, nq in configs:
        try:
            t = run(bq, part, sub, nq)
        except Exception as e:  # VMEM cliff: record and move on
            print(f"bq={bq:4d} part={part:4d} sub={sub:4d} n_qsub={nq}  "
                  f"FAIL {type(e).__name__}: {str(e)[:60]}", flush=True)
            continue
        rows.append((t, bq, part, sub, nq))
        print(f"bq={bq:4d} part={part:4d} sub={sub:4d} n_qsub={nq}  "
              f"{t * 1e3:7.2f} ms  {flops / t / 1e12:5.1f} TF/s", flush=True)
    rows.sort()
    t, bq, part, sub, nq = rows[0]
    print(f"BEST bq={bq} part={part} sub={sub} n_qsub={nq}  "
          f"{t * 1e3:.2f} ms  {flops / t / 1e12:.1f} TF/s", flush=True)

    # DMA-stream kernel (manual double-buffered KV stream, one grid step
    # per LARGE q chunk): KV is read only ceil(sq/bq) times and the carry
    # kernel's per-grid-step scheduling bubbles disappear — but d pads to
    # 128 lanes in HBM for DMA slicing. (bq, sub_kv, bq_inner):
    def run_stream(bq, sub, bqi):
        sq_p = fa._cdiv(sq, bq) * bq
        qb = fa._pad_rows(q, sq_p)
        sk_p = fa._cdiv(sk, sub) * sub
        kb = fa._pad_rows(k, sk_p)
        vb = fa._pad_rows(v, sk_p)
        return timeit(
            fa._flash_stream, qb, kb, vb, float(scale), int(bq), int(sub),
            int(sk), int(bqi),
        )

    for bq, sub, bqi in [(2592, 1152, 648), (2592, 576, 648),
                         (2592, 1152, 864), (1728, 1152, 576),
                         (5184, 576, 576)]:
        try:
            t = run_stream(bq, sub, bqi)
        except Exception as e:
            print(f"stream bq={bq:4d} sub={sub:4d} bqi={bqi:4d}  FAIL "
                  f"{type(e).__name__}: {str(e)[:60]}", flush=True)
            continue
        print(f"stream bq={bq:4d} sub={sub:4d} bqi={bqi:4d}  "
              f"{t * 1e3:7.2f} ms  {flops / t / 1e12:5.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
