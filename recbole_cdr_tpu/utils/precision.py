"""Mixed-precision policy: bf16 compute over f32 master parameters.

The reference is f32-only torch (no dtype knob anywhere). TPU-first the
policy that wins is the standard one: parameters and optimizer state stay
float32 (master weights); the train/eval computation runs in
``compute_dtype`` by casting the parameter pytree at function entry —
gathers, matmuls and propagation chains then move bf16 through HBM/MXU
(half the bytes, 2x the MXU rate) while gradients flow back through the
cast's VJP into f32 updates. Loss reductions accumulate in f32
(``base.weighted_mean`` upcasts).

Enable with ``compute_dtype: bfloat16`` in the config (consumed by the
trainer for every loss / predict / full-sort path).
"""

import jax
import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "fp16": jnp.float16,
}


def resolve_compute_dtype(config) -> jnp.dtype:
    name = str(config["compute_dtype"] or "float32").lower()
    if name not in _DTYPES:
        raise ValueError(
            f"compute_dtype must be one of {sorted(_DTYPES)}, got {name!r}"
        )
    return _DTYPES[name]


def cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype`` (ints/bools pass
    through untouched — ids, masks and histories must stay integral)."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def with_compute_dtype(fn, dtype):
    """Wrap ``fn(params, ...)`` to cast the parameter pytree to ``dtype`` on
    entry. Identity for float32. Host-cached fns (``_no_jit``) are NOT
    wrapped here — casting per host call would re-pass full tables every
    eval batch; such models consume ``compute_dtype`` inside their own
    jitted forward instead (e.g. BiTGCF)."""
    if fn is None or dtype == jnp.float32:
        return fn
    if getattr(fn, "_no_jit", False):
        return fn

    def wrapped(params, *args, **kwargs):
        return fn(cast_floats(params, dtype), *args, **kwargs)

    # evaluator routing hints must survive the wrap
    if getattr(fn, "_pair_cost", False):
        wrapped._pair_cost = True
    return wrapped
