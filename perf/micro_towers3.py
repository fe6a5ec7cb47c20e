"""Tower conv codegen, angle 3 (PERF.md open lead 1): can reformulating
the 3x3 dense-tower convs as explicit MXU matmuls beat XLA's conv path?

The towers measure ~30% MXU (micro_towers2.py); K-padding is neutral and
s2d loses. Two reformulations with IDENTICAL math, measured against the
conv and against the pure-matmul MXU ceiling:

  im2col   materialize the 9-tap patches (B,H,W,9*Cin) once, then one
           (B*H*W, 9Cin) @ (9Cin, Cout) matmul. Trades 9x HBM traffic
           for a perfectly-shaped matmul.
  shiftsum sum of 9 shifted 1x1 convs (each a (B*H*W, Cin) @ (Cin, Cout)
           matmul over a statically shifted view). No 9x blowup; the 9
           partial products accumulate in f32.

Usage: python perf/micro_towers3.py          (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Persistent compile cache (same knob as main.py/bench.py): 24 separate
# jit programs through the tunnel's remote_compile cost ~2 min EACH cold
# — without the cache one tunnel drop restarts the whole budget, with it
# every retry resumes where the last attempt got to.
_cache = os.environ.get("IRR_TPU_COMPILE_CACHE",
                        os.path.expanduser("~/.cache/irr_tpu_xla"))
if _cache and _cache != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

REPS = 10
B, H, W = 16, 110, 256   # L4 eval shape, stacked bidirectional batch


def bench_ingraph(make_body, iters=3):
    """In-graph scan repetition with a carry perturbation (micro2.py
    discipline: standalone dispatch ~3-10 ms through the tunnel, and XLA
    would hoist an unperturbed body)."""
    def rep():
        def body(carry, i):
            return carry + make_body(carry, i), None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return out

    jfn = jax.jit(rep)
    float(jfn().ravel()[0])
    float(jfn().ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = jfn()
    float(o.ravel()[0])
    return (time.perf_counter() - t0) / iters / REPS * 1000


def dev_rand(shape, dt):
    k = jax.random.PRNGKey(hash(shape) % (2**31))
    return jax.jit(lambda k: jax.random.uniform(k, shape, jnp.float32).astype(dt))(k)


def conv3x3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def im2col_matmul(x, wmat):
    """9-tap patch extraction + one matmul. wmat: (9*Cin, Cout)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, dy:dy + x.shape[1], dx:dx + x.shape[2], :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(taps, axis=-1)            # (B,H,W,9Cin)
    y = patches.reshape(-1, patches.shape[-1]) @ wmat   # MXU
    return y.reshape(x.shape[:3] + (wmat.shape[-1],))


def shiftsum_matmul(x, w):
    """Sum of 9 shifted pointwise matmuls. w: (3,3,Cin,Cout)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = xp[:, dy:dy + x.shape[1], dx:dx + x.shape[2], :]
            part = jnp.einsum("bhwc,cf->bhwf", tap, w[dy, dx],
                              preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


def bench_retry(make_body, label):
    """One tunnel hiccup (remote_compile broken pipe) should cost one
    retry, not the whole run; a dead tunnel marks this variant nan and
    the run continues printing partial results (flushed per variant)."""
    for attempt in range(2):
        try:
            t = bench_ingraph(make_body)
            print(f" {t:9.3f}", end="", flush=True)
            return t
        except Exception as e:  # noqa: BLE001 — tunnel transport errors
            if attempt == 0:
                print(f" [{label} retry: {type(e).__name__}]",
                      end="", flush=True)
                time.sleep(60)
    print(f" {'nan':>9}", end="", flush=True)
    return float("nan")


def main():
    dt = jnp.bfloat16
    tower = [(115, 128), (243, 128), (371, 96), (467, 64), (531, 32),
             (563, 2)]
    print(f"shapes: B={B} {H}x{W}, dtype={dt.__name__}; ms per layer",
          flush=True)
    print(f"{'cin->cout':>12} {'conv3x3':>9} {'im2col':>9} {'shiftsum':>9} "
          f"{'mm-floor':>9}", flush=True)
    tot = {"conv": 0.0, "im2col": 0.0, "shift": 0.0, "floor": 0.0}
    for cin, cout in tower:
        x = dev_rand((B, H, W, cin), dt)
        w = dev_rand((3, 3, cin, cout), dt)
        wmat = dev_rand((9 * cin, cout), dt)

        print(f"{cin:>6}->{cout:<5}", end="", flush=True)
        t_conv = bench_retry(
            lambda c, i, x=x, w=w: jnp.sum(
                conv3x3(x + c.astype(dt), w)).astype(jnp.float32), "conv")
        t_i2c = bench_retry(
            lambda c, i, x=x, wmat=wmat: jnp.sum(
                im2col_matmul(x + c.astype(dt), wmat)).astype(jnp.float32),
            "im2col")
        t_ss = bench_retry(
            lambda c, i, x=x, w=w: jnp.sum(
                shiftsum_matmul(x + c.astype(dt), w)).astype(jnp.float32),
            "shiftsum")
        # MXU ceiling: the same FLOPs as ONE dense matmul, ideal shapes
        m = B * H * W
        a = dev_rand((m, 9 * cin), dt)
        bm = dev_rand((9 * cin, max(cout, 8)), dt)
        t_mm = bench_retry(
            lambda c, i, a=a, bm=bm: jnp.sum(
                (a + c.astype(dt)) @ bm).astype(jnp.float32), "mm")
        print(flush=True)
        tot["conv"] += t_conv
        tot["im2col"] += t_i2c
        tot["shift"] += t_ss
        tot["floor"] += t_mm
    print(f"{'TOTAL':>12} {tot['conv']:9.3f} {tot['im2col']:9.3f} "
          f"{tot['shift']:9.3f} {tot['floor']:9.3f}", flush=True)


if __name__ == "__main__":
    main()
