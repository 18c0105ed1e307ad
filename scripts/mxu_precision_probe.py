"""Per-stage diagnosis of the round-4 MXU-kernel tier-test failure
(VERDICT r4 Missing #1 / Next #1a): run each suspect matmul stage as its
own minimal Pallas kernel on the REAL chip and print max abs/rel error vs
the f32 oracle.

Hypothesis under test (KERNELS.md "Deformable attention, part 4"): the
MXU's default single-pass matmul rounds BOTH operands to bf16, so a
0/1-selector matmul against *bf16* data is exact, but any stage whose
data operand is an f32 intermediate silently quantizes it (~2^-9
relative) — which interpret mode (true f32) can never reproduce.

Stages probed:
  A. select-bf16 : dot(S01, V_bf16)        -> expect EXACT (0 error)
  B. seg-default : dot(X_f32, M01) 1-pass  -> expect ~1e-3 rel (the BUG)
  C. seg-bf16x2  : hi/lo split, 2 passes   -> expect ~4e-6 rel (the FIX)

Prints one JSON line per stage; exits nonzero if the select or fix stage
violates the kernel test contract err <= 5e-5 + 1e-3*|want|.
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SP, K, N = 256, 512, 128


def _kernel_single(x_ref, m_ref, o_ref):
    o_ref[...] = jnp.dot(x_ref[...], m_ref[...],
                         preferred_element_type=jnp.float32)


def _kernel_split(x_ref, m_ref, o_ref):
    x = x_ref[...]
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mb = m_ref[...].astype(jnp.bfloat16)
    o_ref[...] = (jnp.dot(hi, mb, preferred_element_type=jnp.float32)
                  + jnp.dot(lo, mb, preferred_element_type=jnp.float32))


def _run(kernel, x, m):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], m.shape[1]),
                                       jnp.float32),
    )(x, m)


def _report(name, got, want, fail=False):
    """fail=True applies the kernel test contract: err <= 5e-5 + 1e-3*|want|
    (mixed criterion — pure relative error blows up under cancellation
    where the true sum is ~0, which atol covers by design)."""
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    abs_err = np.abs(got - want)
    denom = np.maximum(np.abs(want), 1e-12)
    viol = abs_err > (5e-5 + 1e-3 * np.abs(want))
    line = {
        "stage": name,
        "max_abs": float(abs_err.max()),
        "max_rel": float((abs_err / denom).max()),
        "mismatch_frac_contract": float(viol.mean()),
    }
    print(json.dumps(line), flush=True)
    return fail and bool(viol.any())


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    rng = np.random.RandomState(0)
    failed = False

    # A. 0/1 select against bf16 data — must be exact.
    y0 = rng.randint(0, K, SP)
    s01 = (np.arange(K)[None, :] == y0[:, None])
    v = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
    want = np.asarray(v, np.float32)[y0]
    got = _run(_kernel_single, jnp.asarray(s01, jnp.bfloat16), v)
    failed |= _report("A_select_bf16_single_pass", got, want, fail=True)

    # B/C. segment-sum style: f32 data against a 0/1 matrix.
    x = rng.randn(SP, K).astype(np.float32)
    m01 = (rng.rand(K, N) < (4.0 / K)).astype(np.float32)
    want = x.astype(np.float64) @ m01.astype(np.float64)
    got_b = _run(_kernel_single, jnp.asarray(x), jnp.asarray(m01))
    _report("B_f32_data_single_pass_DEFAULT", got_b, want)
    got_c = _run(_kernel_split, jnp.asarray(x), jnp.asarray(m01))
    failed |= _report("C_f32_data_bf16x2_split", got_c, want, fail=True)

    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
