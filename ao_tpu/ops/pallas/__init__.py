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


def parity_major_perm(n: int):
    """Token permutation produced by the fp8-KV splice kernel's even/odd
    word extraction over an n-token block: output row i holds logical
    token 2*(i % (n/2)) + i // (n/2) — all even tokens ascending, then all
    odd tokens. Wrappers apply this to per-token scale rows (see
    :func:`fp8_words_to_bf16`)."""
    import numpy as np

    ip = np.arange(n)
    return 2 * (ip % (n // 2)) + ip // (n // 2)


def parity_window(t: int):
    """Parity-permutation window for the fp8 "ktp" KV layout: the decode
    kernel's block_t MUST equal the window the cache permuted its columns
    over, so both sides derive it from this one convention. Returns None
    when ``t`` cannot host the layout (caller falls back to "kt")."""
    if t % 32:
        return None
    if t <= 2048:
        return t
    return 2048 if t % 2048 == 0 else None


def parity_slot(pos, pbt: int):
    """Storage column of logical token ``pos`` under the parity layout:
    within each pbt window, even tokens pack the first half in order, odd
    tokens the second (inverse of :func:`parity_major_perm`). Works on
    traced arrays (pure arithmetic)."""
    w, i = pos // pbt, pos % pbt
    return w * pbt + i // 2 + (i % 2) * (pbt // 2)


def plane_window(t: int):
    """Plane-permutation window for the int4 "ck4" KV layout (same
    convention role as :func:`parity_window` for fp8): the decode kernel's
    block_t MUST equal the window the cache plane-permuted K's token lanes
    and both scale arrays over. None -> caller falls back to the legacy
    tokens-words layout."""
    if t % 64:
        return None
    if t <= 2048:
        return t
    return 2048 if t % 2048 == 0 else None


def plane_slot(pos, pbt: int):
    """Storage lane of logical token ``pos`` under the plane-major layout
    (inverse of :func:`plane_major_perm` per pbt window): token 4m+j ->
    j*(pbt/4)+m. Pure arithmetic, works on traced arrays."""
    w, i = pos // pbt, pos % pbt
    return w * pbt + (i % 4) * (pbt // 4) + i // 4


def fp8_words_to_bf16(words):
    """In-kernel decode of token-axis-packed e4m3 words → (4R, D) bf16
    ``value * 2^-120`` in parity-major token order.

    The e4m3 bit layout (1s4e3m, bias 7) slices EXACTLY into bf16
    (1s8e7m, bias 127) by shifting the magnitude left 4: the bf16 then
    reads ``value * 2^(7-127+...)= value * 2^-120`` for normals AND
    denormals (both are base-2 with aligned denormal semantics). Callers
    fold the 2^120 back into the f32 scales outside the kernel and scale
    q by 2^60 so neither dot-product operand under/overflows f32.
    NaN (0x7F/FF) decodes to a finite value and e4m3 denormals flush to
    zero on the VPU — both ≤ 2^-6 of the smallest normal step under
    per-token scales. 11 integer lane-ops per 4 elements, no int→float
    converts (cf. the int4 plane decode, :func:`int4_words_to_bf16`)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    # even bytes: magnitude bits 0..6 -> 4..10 (<<4), sign 7 -> 15 (<<8);
    # odd bytes land pre-shifted: magnitude 8..14 -> 4..10 (>>4) and the
    # sign bit 15 is ALREADY at bit 15 — 3 ops instead of 6
    even = ((words & 0x007F007F) << 4) | ((words & 0x00800080) << 8)
    odd = ((words & 0x7F007F00) >> 4) | (words & (-0x80000000 + 0x8000))
    return jnp.concatenate([
        pltpu.bitcast(even, jnp.bfloat16),
        pltpu.bitcast(odd, jnp.bfloat16),
    ], axis=0)


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
