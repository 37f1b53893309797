"""Component-level unit tests: masking invariants, GRU equivalence,
attention behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsreclib_tpu.models.components.attention import (
    AdditiveAttention,
    MultiHeadSelfAttention,
    PolyAttention,
    masked_softmax,
)
from newsreclib_tpu.models.components.rnn import MaskedGRU


def test_masked_softmax_zeroes_masked_and_normalizes():
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    mask = jnp.asarray([[True, True, False, True]])
    w = masked_softmax(logits, mask)
    assert float(w[0, 2]) == 0.0
    np.testing.assert_allclose(float(jnp.sum(w)), 1.0, atol=1e-6)


def test_additive_attention_mask_invariance():
    """Changing values at masked positions must not change the output —
    the property the reference lacks (unmasked softmax, attention.py:36-38)
    and the reason our static padding needs true masking."""
    m = AdditiveAttention(query_dim=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 12)).astype(np.float32))
    mask = jnp.asarray([[True, True, True, False, False]] * 2)
    params = m.init(jax.random.key(0), x, mask)
    out1 = m.apply(params, x, mask)
    x2 = x.at[:, 3:, :].set(999.0)  # perturb masked positions
    out2 = m.apply(params, x2, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_mhsa_mask_invariance():
    m = MultiHeadSelfAttention(num_heads=3)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 6, 12)).astype(np.float32))
    mask = jnp.asarray([[True] * 4 + [False] * 2] * 2)
    params = m.init(jax.random.key(0), x, mask)
    out1 = m.apply(params, x, mask)
    x2 = x.at[:, 4:, :].add(123.0)
    out2 = m.apply(params, x2, mask)
    # valid positions unaffected by masked-position perturbation
    np.testing.assert_allclose(
        np.asarray(out1)[:, :4], np.asarray(out2)[:, :4], atol=1e-4
    )
    # masked positions are zeroed
    assert np.allclose(np.asarray(out1)[:, 4:], 0.0)


def test_poly_attention_shapes_and_mask():
    m = PolyAttention(num_context_codes=4, context_code_dim=8)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(3, 7, 12)).astype(np.float32))
    mask = jnp.asarray(np.random.default_rng(3).random((3, 7)) < 0.7)
    mask = mask.at[:, 0].set(True)
    params = m.init(jax.random.key(0), x, mask)
    out = m.apply(params, x, mask)
    assert out.shape == (3, 4, 12)
    x2 = jnp.where(mask[..., None], x, -55.0)
    out2 = m.apply(params, x2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_masked_gru_equals_truncated_sequences():
    """Last-valid-carry over a left-aligned masked sequence must equal
    running the GRU on the truncated sequence (pack_padded semantics)."""
    gru = MaskedGRU(hidden_dim=6)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(3, 8, 5)).astype(np.float32))
    lens = [3, 8, 1]
    mask = jnp.asarray([[i < n for i in range(8)] for n in lens])
    params = gru.init(jax.random.key(0), x, mask)
    out = gru.apply(params, x, mask)
    for b, n in enumerate(lens):
        xt = x[b : b + 1, :n, :]
        mt = jnp.ones((1, n), dtype=bool)
        want = gru.apply(params, xt, mt)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(want[0]), atol=1e-5)


def test_shard_impressions_partition():
    from newsreclib_tpu.data.batching import Impressions
    from newsreclib_tpu.parallel.data import shard_impressions

    rng = np.random.default_rng(5)
    n = 17
    hists = [rng.integers(1, 50, size=rng.integers(1, 6)) for _ in range(n)]
    cands = [rng.integers(1, 50, size=4) for _ in range(n)]
    labels = [[1, 0, 0, 0] for _ in range(n)]
    imp = Impressions.from_lists(hists, cands, labels, np.arange(n))
    shards = [shard_impressions(imp, p, 4) for p in range(4)]
    assert sum(len(s) for s in shards) == n
    # each original impression appears in exactly one shard, intact
    seen = set()
    for s in shards:
        for i in range(len(s)):
            u = int(s.user_idx[i])
            assert u not in seen
            seen.add(u)
            np.testing.assert_array_equal(s.hist(i), imp.hist(u))
    assert len(seen) == n


def test_mhsa_packing_exact():
    """Segment-ID article packing (MHSAAddAtt.pack_to) must be numerically
    EXACT vs the unpacked path: block-diagonal pair mask keeps softmax rows
    on their own article's keys (round-4 MFU work, VERDICT r3 item 5)."""
    import jax
    import numpy as np

    from newsreclib_tpu.models.components.text import MHSAAddAtt

    rng = np.random.default_rng(0)
    U, L, D = 64, 16, 60
    tokens = rng.integers(1, 200, size=(U, L)).astype(np.int32)
    lens = rng.integers(1, L + 1, size=U)
    mask = np.arange(L)[None, :] < lens[:, None]
    tokens = tokens * mask
    # a fully-empty (pad) article row must stay zero in both paths
    tokens[0] = 0
    mask[0] = False

    kwargs = dict(vocab_size=200, embed_dim=D, num_heads=4, query_dim=24,
                  dropout=0.0)
    plain = MHSAAddAtt(**kwargs)
    packed = MHSAAddAtt(**kwargs, pack_to=128)  # P = 8
    params = plain.init({"params": jax.random.key(0)}, tokens, mask, True)
    y0 = plain.apply(params, tokens, mask, True)
    y1 = packed.apply(params, tokens, mask, True)  # identical param tree
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)

    # width that doesn't divide pack_to falls back to the unpacked path
    odd = MHSAAddAtt(**kwargs, pack_to=100)
    y2 = odd.apply(params, tokens, mask, True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y2), atol=0)
