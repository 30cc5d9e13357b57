"""Pallas TPU kernels for the hot quantized ops."""


class UnsupportedShape(Exception):
    """Raised by a Pallas kernel wrapper when the shapes/dtypes don't meet the
    kernel's tiling constraints; callers fall back to the XLA path."""


def plane_major_perm(n: int):
    """Token permutation produced by the int4-KV kernels' nibble-plane
    sublane stacking over an n-token block: output row i' = j*(n/4)+m holds
    logical token 4m+j. Wrappers apply this to per-token scale rows so they
    align with the kernel's score/prob columns (the single shared definition
    — decode_attention and paged_attention must agree with the kernels'
    stacking order)."""
    import numpy as np

    ip = np.arange(n)
    return 4 * (ip % (n // 4)) + ip // (n // 4)


def int4_words_to_bf16(words):
    """In-kernel decode of token-axis int4 words → (8R, D) bf16 ``u-8``
    values in plane-major token order (rows follow :func:`plane_major_perm`
    of the 8R-token block). One shift/and/or + an i32→bf16 bitcast per
    plane — no int→float converts (the bit geometry of
    serving/kvcache._kv_shift and qarrays/int4.pack_int4_magic)."""
    import jax.numpy as jnp

    return int4_words_to_bf16_biased(words) - jnp.bfloat16(136.0)


def int4_words_to_bf16_biased(words):
    """:func:`int4_words_to_bf16` WITHOUT the -136 recenter: returns
    ``128 + u`` (u the unsigned nibble) so the decode is pure i32 lane ops
    + a free bitcast. Mosaic unpacks bf16 elementwise arithmetic on v5e,
    so the per-element bf16 subtract costs more than the 3 integer ops of
    the field extraction itself; dot-consumers instead fold the constant
    into the contraction: dot(x, u-8) = dot(x, 128+u) - 136*rowsum(x)
    (the same -136-recenter the int4 weight kernels use,
    int4_matmul.py)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    return jnp.concatenate([
        pltpu.bitcast(
            ((words >> (4 * j)) & 0x000F000F) | 0x43004300, jnp.bfloat16)
        for j in range(4)
    ], axis=0)
