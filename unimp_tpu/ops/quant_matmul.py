"""Weight-streaming int8 matmul kernel for the decode hot path.

Why this exists: ``QuantizedKernel`` dequantizes via ``__jax_array__``
(cast + per-output-channel scale), and inside the decode ``while_loop``
that dequant is LOOP-INVARIANT — XLA hoists a full bf16 copy of every
decode weight out of the loop, so ``--eval_param_dtype=int8`` halved
the weight *storage* but not the per-step HBM *stream* (measured:
int8 4b eval was only ~6% faster than bf16, BENCH artifacts
eval_4b_int8 vs eval_4b). The reference gets the stream win from
bitsandbytes CUDA kernels inside each linear
(/root/reference/UniMP/pipeline/serve/model_worker.py:86-142,
``load_in_8bit``); this is the TPU-native equivalent.

The kernel streams the int8 weight blocks HBM->VMEM, dequantizes on
the VPU inside VMEM, and feeds the MXU — the only HBM traffic is the
int8 bytes (plus the activations, negligible at decode shapes). The
per-output-channel scale folds into the f32 accumulator once per
output block, NOT per k-block (dot(x, q*s) == dot(x, q) * s).

Grid is (N/bn, K/bk) with the k axis innermost ("arbitrary"): each
(n, k) program accumulates one [M, bn] f32 tile in VMEM scratch and
writes it once on the last k step. M (the token rows, B*K beams at
decode) stays whole — it is small (<=512) and the second-minor block
dim equals the array dim, satisfying the Mosaic tiling rule.

Shapes are padded to the block grid with zeros OUTSIDE the kernel
(zero columns of x / rows of q contribute nothing to the dot); for the
model's shapes (all multiples of 128) the pads are no-ops. The pad of
``q`` is loop-invariant, so in a decode loop XLA hoists one padded
int8 copy — still half the bf16 bytes.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unimp_tpu.ops.flash_attention import _interpret_default


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk: int):
    k_i = pl.program_id(1)

    @pl.when(k_i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    acc_ref[...] += jax.lax.dot_general(
        x, w_ref[...].astype(x.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_i == nk - 1)
    def _finalize():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _pad_to(a, axis, mult):
    r = (-a.shape[axis]) % mult
    if r == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, r)
    return jnp.pad(a, widths)


def quant_dot(x: jax.Array, kernel, *, max_rows: Optional[int] = None
              ) -> jax.Array:
    """``x @ kernel`` where kernel is a 2-D array OR QuantizedKernel.

    The decode dispatch point: a QuantizedKernel at small row counts
    (a decode/serving step) routes to the Pallas weight-streaming
    kernel so the HBM stream is the int8 bytes; prefill/training row
    counts (or plain arrays) take the XLA dequant-dot — there the
    weight read amortizes over many rows and XLA fuses the dequant
    into the matmul (no loop to hoist it out of).
    """
    from unimp_tpu.utils.quant import QuantizedKernel

    if max_rows is None:
        max_rows = int(os.environ.get("UNIMP_QMM_MAX_ROWS", "512"))
    if isinstance(kernel, QuantizedKernel):
        rows = x.size // x.shape[-1]
        if rows <= max_rows:
            return quant_matmul(
                x, kernel.q, kernel.scale.reshape(-1))
        kernel = kernel.astype(x.dtype)
    return x @ kernel.astype(x.dtype)


def quant_matmul(
    x: jax.Array,        # [..., K] activations (compute dtype)
    q: jax.Array,        # [K, N] int8 weight
    scale: jax.Array,    # [N] f32 per-output-channel scale
    *,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``x @ (q * scale)`` streaming only the int8 weight bytes.

    Returns [..., N] in x.dtype. Intended for decode/serving steps
    where M = prod(batch dims) is small and the weight stream is the
    bound; falls back to the same math via XLA off-TPU.

    Differentiable in ``x`` (custom VJP: the cotangent is the dequant
    transpose matmul ``(g * scale) @ q.T`` via XLA — backward row
    counts are training-sized, where XLA's fused dequant wins anyway).
    ``q``/``scale`` are weight-only-quant constants by design
    (quantize_params_int8 only touches frozen/eval kernels), so their
    cotangents are zero — stop-gradient semantics.
    """
    return _quant_matmul(x, q, scale, block_n, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _quant_matmul(x, q, scale, block_n, block_k, interpret):
    return _quant_matmul_impl(x, q, scale, block_n, block_k, interpret)


def _quant_matmul_fwd(x, q, scale, block_n, block_k, interpret):
    out = _quant_matmul_impl(x, q, scale, block_n, block_k, interpret)
    return out, (q, scale)


def _quant_matmul_bwd(block_n, block_k, interpret, res, g):
    import numpy as np

    q, scale = res
    gs = g * scale.astype(g.dtype)  # [..., N]
    dx = jax.lax.dot_general(
        gs, q.astype(g.dtype),
        (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)
    dq = np.zeros(q.shape, jax.dtypes.float0)  # int8: symbolic-zero tangent
    return dx, dq, jnp.zeros_like(scale)


_quant_matmul.defvjp(_quant_matmul_fwd, _quant_matmul_bwd)


def _quant_matmul_impl(x, q, scale, block_n, block_k, interpret):
    if interpret is None:
        interpret = _interpret_default()
    *lead, kdim = x.shape
    n = q.shape[1]
    assert q.shape[0] == kdim, (x.shape, q.shape)
    x2 = x.reshape(-1, kdim)
    m = x2.shape[0]

    bn = block_n or int(os.environ.get("UNIMP_QMM_BN", "512"))
    bk = block_k or int(os.environ.get("UNIMP_QMM_BK", "2560"))
    bn = min(bn, n)
    bk = min(bk, kdim)

    x2 = _pad_to(x2, 1, bk)
    qp = _pad_to(_pad_to(q, 0, bk), 1, bn)
    sp = _pad_to(scale.astype(jnp.float32), 0, bn).reshape(1, -1)
    kp, np_ = qp.shape
    nk, nn = kp // bk, np_ // bn

    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((m, bk), lambda ni, ki: (0, ki)),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni)),
            pl.BlockSpec((1, bn), lambda ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((m, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, qp, sp)
    return out[:, :n].reshape(*lead, n)
