"""Weight-only int8 quantization for inference.

TPU-native counterpart of the reference worker's 8-bit load option
(/root/reference/UniMP/pipeline/serve/model_worker.py:86-142,
``load_in_8bit``): matmul kernels are stored int8 with a per-output-
channel f32 scale and dequantized to the compute dtype at the point of
use inside the jitted program. Decode at small batch streams the full
weight set from HBM every step, so halving the weight bytes both
speeds the step and frees HBM for larger eval batches.

No model changes: ``QuantizedKernel`` is a pytree that any jnp op
accepts via the ``__jax_array__`` protocol — flax modules calling
``kernel.astype(x.dtype)`` or ``jnp.concatenate([gk, uk])`` trace the
dequant (cast + channel-scale multiply) inline, which XLA fuses or
materializes transiently per layer (never the whole model at once).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class QuantizedKernel:
    """int8 weight + per-output-channel scale; acts like an array in jit.

    ``q`` has the original kernel shape; ``scale`` is per output
    channel and BROADCASTS over ``q`` — ``q.shape[1:]`` for Dense/Proj
    kernels (axis 0 is the input dim in flax kernels), ``[out]`` for
    o_proj-style DenseGeneral kernels whose two leading axes are both
    contracted. flax's apply-time shape validation only checks the
    first flattened leaf (q), which keeps the original shape.

    ``dtype`` is the COMPUTE dtype the implicit ``__jax_array__``
    dequant targets (stored as static pytree aux data) — it must match
    the model's compute dtype so fp32-precision runs don't silently
    truncate through bf16 on the fused-weight decode paths.
    """

    __slots__ = ("q", "scale", "_dtype")

    def __init__(self, q, scale, dtype=jnp.bfloat16):
        self.q = q
        self.scale = scale
        self._dtype = jnp.dtype(dtype)

    # ---- array-protocol surface used by the model code ----

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def size(self):
        return self.q.size

    @property
    def dtype(self):
        return self._dtype

    def astype(self, dtype):
        return self.q.astype(dtype) * self.scale.astype(dtype)

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        if (len(shape) >= 2 and shape[0] == self.q.shape[0]
                and self.scale.size == self.q.size // self.q.shape[0]):
            # input axis kept: reshape q and the per-channel scale in step
            return QuantizedKernel(
                self.q.reshape(shape), self.scale.reshape(shape[1:]),
                dtype=self._dtype,
            )
        return self.__jax_array__().reshape(shape)

    def __jax_array__(self):
        return self.astype(self._dtype)

    def __repr__(self):
        return (f"QuantizedKernel(shape={self.q.shape}, "
                f"scale={self.scale.shape}, dtype={self._dtype})")


def _is_qk(x):
    return isinstance(x, QuantizedKernel)


jax.tree_util.register_pytree_with_keys(
    QuantizedKernel,
    lambda t: (((jax.tree_util.GetAttrKey("q"), t.q),
                (jax.tree_util.GetAttrKey("scale"), t.scale)), t._dtype),
    lambda dtype, children: QuantizedKernel(*children, dtype=dtype),
)


def _quantize_leaf(leaf, n_in_axes: int = 1):
    """Kernel -> (q int8, scale f32 reduced over the input axes).

    ``n_in_axes`` leading axes are contraction (input) axes; the scale
    is per output channel over the rest. For flax shapes: Dense
    [in, N] and Proj [in, H, d] quantize with n_in_axes=1 (scale [N] /
    [H, d]); o_proj-style DenseGeneral kernels [H, d, out] contract
    their two leading axes, so n_in_axes=2 (scale [out]) — a scale that
    varied along a contracted axis could not fold out of the matmul
    (ops/quant_matmul.py applies it to the accumulator, after the
    contraction)."""
    w = jnp.asarray(leaf, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(n_in_axes)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def concat_kernels_int8(kernels):
    """Concatenate 2-D QuantizedKernels along the OUTPUT axis without
    dequantizing (the fused-QKV / fused-gate-up decode matmuls): int8
    payloads concat on axis 1, per-channel scales on axis 0."""
    q = jnp.concatenate([k.q for k in kernels], axis=1)
    s = jnp.concatenate([k.scale.reshape(-1) for k in kernels])
    return QuantizedKernel(q, s, dtype=kernels[0].dtype)


def quantize_params_int8(params, *, min_size: int = 1 << 16,
                         dtype=jnp.bfloat16):
    """Quantize every matmul kernel (leaf named 'kernel', ndim>=2 and at
    least ``min_size`` elements) to int8; other leaves pass through
    (norms/biases/embeddings stay high precision — embeddings are
    lookup tables, not streamed matmuls). ``dtype`` is the compute
    dtype the kernels dequantize to inside the model."""
    quant = jax.jit(_quantize_leaf, static_argnames=("n_in_axes",))

    def walk(path, leaf):
        key = path[-1]
        name = getattr(key, "key", getattr(key, "name", None))
        parent = None
        if len(path) >= 2:
            p = path[-2]
            parent = getattr(p, "key", getattr(p, "name", None))
        if (
            name == "kernel"
            and getattr(leaf, "ndim", 0) >= 2
            and leaf.size >= min_size
            and not isinstance(leaf, QuantizedKernel)
        ):
            # o_proj kernels [H, d, out] contract BOTH leading axes
            n_in = 2 if (parent == "o_proj" and leaf.ndim == 3) else 1
            return QuantizedKernel(*quant(leaf, n_in_axes=n_in),
                                   dtype=dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(walk, params)


def dequantize_params(params, dtype=jnp.float32):
    """QuantizedKernel leaves -> plain float arrays ON DEVICE.

    Materializes the full float tree — use dequantize_params_host for
    big models where that would spike HBM (checkpoint/export paths)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if _is_qk(x) else x,
        params, is_leaf=_is_qk,
    )


def dequantize_params_host(params, dtype=np.float32):
    """QuantizedKernel leaves -> HOST numpy float arrays, one kernel at
    a time: the device transient is a single kernel's float copy, never
    the whole frozen tree (a 2.7B --frozen_int8 run would otherwise
    materialize ~10 GB f32 on a 16 GB chip mid-training just to save a
    checkpoint)."""
    def leaf(x):
        if _is_qk(x):
            return np.asarray(x.astype(jnp.float32)).astype(dtype)
        return x

    return jax.tree_util.tree_map(leaf, params, is_leaf=_is_qk)


def abstract_dequantized(params, dtype=jnp.float32):
    """ShapeDtypeStruct tree of the dequantized layout — the restore
    target for checkpoints written by dequantizing saves (no memory)."""
    def leaf(x):
        if _is_qk(x):
            return jax.ShapeDtypeStruct(x.shape, dtype)
        return x

    return jax.tree_util.tree_map(leaf, params, is_leaf=_is_qk)


def quantized_bytes(params) -> int:
    """Device bytes of the (possibly quantized) param tree."""
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(params)
        if hasattr(leaf, "size")
    )


def count_quantized(params) -> int:
    n = 0

    def walk(leaf):
        nonlocal n
        if _is_qk(leaf):
            n += 1
        return leaf

    jax.tree_util.tree_map(walk, params, is_leaf=_is_qk)
    return n
