"""Head-packed spatial attention experiment (VERDICT r3 item 2).

Question: the spatial flash kernel runs d=40 heads (SD1.5) against a
128x128 MXU — README calls ~61 TF/s "the ceiling imposed by d=40
(40/128 lanes)". Can packing 3 heads into 120 lanes with block-diagonal
masks (the short_attention trick) lift it?

The hypothesis (from a 128x128-tile cycle model): a (M,K)@(K,N) dot
costs ~ M * ceil(K/128) * ceil(N/128) output-tile cycles independent of
how many K lanes are non-zero, so block-diagonal packing rearranges the
same output elements at the same cost — no win, but also no loss.

Measured on v5e (2026-08-19, this machine), flagship 576^2 shapes
(bq=576, sk=5184, d=40, G=208 head-triples = 624 bh rows; every row
below covers the SAME total work, all 624 heads):

    qkt_separate_d40      2.29 ms    65.2 TF/s of d=40-useful flops
    qkt_packed_bd120      3.86 ms   115.8 TF/s raw = 38.6 useful
    qkt_d128_ref          3.84 ms   124.3 TF/s (d=128, for reference)
    pv_separate_d40       7.12 ms    20.9 TF/s useful (HBM-bound: reads
                                     the 3.7 GB bf16 P matrix at ~520 GB/s)
    pv_packed_bd120       7.28 ms    61.4 TF/s raw = 20.5 useful

Two findings, both killing the packing idea — and one refuting the
naive model:

  1. QK^T: packing is 1.69x SLOWER, not neutral. d=40 contraction is
     not "padded to a full 128 pass" by XLA: the separate d=40 einsum
     beats the d=128 one 2.29 vs 3.84 ms (same M, N), i.e. XLA/Mosaic
     already exploits the short contraction. Packing to 120 lanes
     forfeits exactly that advantage (packed 3.86 ms ~= d128's 3.84).
  2. PV at these shapes in isolation is HBM-bound on streaming P, and
     identical packed vs separate (7.28 vs 7.12 ms). Inside the flash
     kernel P lives in VMEM, so this bound doesn't apply there — but
     packing changes nothing either way.

CONCLUSION: head-packing cannot fund the 576^2 margin; the production
kernel's padding of d 40->128 inside VMEM tiles costs lane density,
not wall-clock (output-tile bound), and the QK^T side would actively
lose by packing. The kernel's remaining headroom is softmax/pipeline
overlap. Recorded as the negative result VERDICT r3 item 2 asked for.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def sync(x):
    # over the axon tunnel block_until_ready can return before the device
    # finishes; a host fetch of one element is a reliable barrier
    _ = float(jnp.ravel(x)[0])


def timeit(f, *args, iters=20):
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    assert jax.default_backend() == "tpu", "run on the TPU (axon) env"
    k = jax.random.PRNGKey(0)
    bq, sk, d = 576, 5184, 40
    G = 208  # head triples: 624 bh rows = flagship 576^2 spatial batch
    dt = jnp.bfloat16

    rows = []

    # reduce inside the jit: the matmul still fully executes (XLA fuses the
    # sum tile-wise) but the multi-GB fp32 score tensor never hits HBM
    f_sep = jax.jit(lambda a, b: jnp.einsum(
        "gmd,gnd->gmn", a, b, preferred_element_type=jnp.float32).sum())
    f_bd = jax.jit(lambda a, b: jnp.einsum(
        "gmd,gdn->gmn", a, b, preferred_element_type=jnp.float32).sum())
    f_pv = jax.jit(lambda a, b: jnp.einsum(
        "gmn,gnd->gmd", a, b, preferred_element_type=jnp.float32).sum())

    # --- QK^T ---
    # separate: 3G dots of (bq,40)@(40,sk)
    q3 = jax.random.normal(k, (3 * G, bq, d), dt)
    k3 = jax.random.normal(k, (3 * G, sk, d), dt)
    t = timeit(f_sep, q3, k3)
    fl = 2 * 3 * G * bq * sk * d
    rows.append(("qkt_separate_d40", t, fl / t / 1e12))
    del q3, k3

    # packed block-diagonal: G dots of (bq,120)@(120, 3*sk)
    qp = jax.random.normal(k, (G, bq, 3 * d), dt)
    kbd = jax.random.normal(k, (G, 3 * d, 3 * sk), dt)  # zeros don't change timing
    t = timeit(f_bd, qp, kbd)
    fl = 2 * G * bq * 3 * sk * 3 * d
    rows.append(("qkt_packed_bd120", t, fl / t / 1e12))
    del qp, kbd

    # d=128 reference: 3G dots at full contraction
    q8 = jax.random.normal(k, (3 * G, bq, 128), dt)
    k8 = jax.random.normal(k, (3 * G, sk, 128), dt)
    t = timeit(f_sep, q8, k8)
    fl = 2 * 3 * G * bq * sk * 128
    rows.append(("qkt_d128_ref", t, fl / t / 1e12))
    del q8, k8

    # --- PV ---
    p3 = jax.random.normal(k, (3 * G, bq, sk), dt)
    v3 = jax.random.normal(k, (3 * G, sk, d), dt)
    t = timeit(f_pv, p3, v3)
    fl = 2 * 3 * G * bq * sk * d
    rows.append(("pv_separate_d40", t, fl / t / 1e12))
    del p3, v3

    pp = jax.random.normal(k, (G, bq, 3 * sk), dt)
    vbd = jax.random.normal(k, (G, 3 * sk, 3 * d), dt)
    t = timeit(f_pv, pp, vbd)
    fl = 2 * G * bq * 3 * sk * 3 * d
    rows.append(("pv_packed_bd120", t, fl / t / 1e12))
    del pp, vbd

    for name, t, tf in rows:
        print(f"{name:20s} {t * 1e3:8.2f} ms   {tf:6.1f} TF/s")
    # both timings cover all 624 heads: <1.0 = packing wins, >1.0 = loses
    sep = rows[0][1]
    bd = rows[1][1]
    print(f"\nqkt packed/separate time ratio (same total work): {bd / sep:.2f}")


if __name__ == "__main__":
    main()
