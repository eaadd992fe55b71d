"""A/B the ConvTranspose2d lowering on the real TPU: einsum+depth-to-space
vs lax.conv_transpose, on the full SceneSeg forward (the decoder tail is
where all the k==s upsamples live — docs/SCALING.md's named hot spot).

AVP_CT_EINSUM is read at TRACE time inside ConvTranspose2d.__call__, so one
process can trace both variants back-to-back on identical inputs; both get
the same 150-execution tunnel warm-up before timing (verify SKILL.md).
"""
import os
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.core.cache import setup_compilation_cache
setup_compilation_cache(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")

N_WARM = int(os.environ.get("N_WARM", "150"))
N_TIME = int(os.environ.get("N_TIME", "200"))


def build(einsum: bool):
    os.environ["AVP_CT_EINSUM"] = "1" if einsum else "0"
    from autoware_vision_pilot_tpu.models import SceneSegNetwork
    m = SceneSegNetwork(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    v = m.init(jax.random.key(0), jnp.zeros((1, 320, 640, 3), jnp.bfloat16))

    @jax.jit
    def fwd(v, x, salt):
        # salt feeds the input so every iteration is a fresh (prog, args)
        # pair — defeats the tunnel's memoized-replay trap. The salt arg
        # stays f32: memoization keys on argument BYTES, and bf16 can only
        # hold 128 distinct values per octave, so a bf16 salt silently
        # collides across iterations (measured: collisions pushed apparent
        # throughput past the chip's peak FLOP/s). The returned checksum
        # is CHAINED into the next call's salt and the final one is
        # FETCHED: block_until_ready through the tunnel is phantom
        # (BENCH_NOTES round-2 trap) — only a fetched value whose data
        # depends on every execution proves the window really ran.
        mask = jnp.argmax(
            m.apply(v, x + salt.astype(x.dtype)).astype(jnp.float32), -1)
        return jnp.sum(mask).astype(jnp.float32)

    return fwd, v


def timeit(fwd, v):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 320, 640, 3)), jnp.bfloat16)
    s = jnp.float32(0.0)
    for i in range(N_WARM):
        s = fwd(v, x, s + jnp.float32(i))
    float(np.asarray(s))
    t0 = time.perf_counter()
    s = jnp.float32(1.0)
    for i in range(N_TIME):
        s = fwd(v, x, s * 1e-20 + jnp.float32(N_WARM + i))
    float(np.asarray(s))
    return (time.perf_counter() - t0) / N_TIME * 1e3


def main():
    fwd_e, v_e = build(True)
    fwd_c, v_c = build(False)
    ms_e = timeit(fwd_e, v_e)
    ms_c = timeit(fwd_c, v_c)
    # second interleaved pass to cancel drift in tunnel conditions
    ms_e2 = timeit(fwd_e, v_e)
    ms_c2 = timeit(fwd_c, v_c)
    print(f"einsum+d2s : {ms_e:.3f} / {ms_e2:.3f} ms")
    print(f"conv_transpose: {ms_c:.3f} / {ms_c2:.3f} ms")


if __name__ == "__main__":
    main()
