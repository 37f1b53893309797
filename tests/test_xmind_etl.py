"""xMIND ETL tests: translated-news merge + bilingual mixing (offline)."""

import os

import numpy as np
import pytest

from newsreclib_tpu.data.mind import MINDConfig, MINDData
from newsreclib_tpu.data.testing import write_mind_fixture
from newsreclib_tpu.data.xmind import XMINDConfig, XMINDData


@pytest.fixture(scope="module")
def xmind(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("xmind"))
    write_mind_fixture(data_dir, num_news=80, num_train_behaviors=100, num_dev_behaviors=40)
    mind = MINDData(MINDConfig(data_dir=data_dir, dataset_size="demo",
                               sentiment_annotator="lexicon"))
    mind.news_store("train")
    mind.news_store("test")
    # write translated news for a subset of nids (both raw splits)
    rng = np.random.default_rng(0)
    for split in ("train", "dev"):
        d = os.path.join(data_dir, "xMIND", "fin", split)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "news.tsv"), "w") as f:
            for i in range(1, 61):  # first 60 articles translated
                f.write(f"N{i}\tkäännetty otsikko {i} sanaa\ttiivistelmä {i}\n")
    return XMINDData(mind, XMINDConfig(tgt_lang="fin", bilingual_train=True,
                                       pct_tgt_lang_train=0.5, pct_tgt_lang_test=1.0))


def test_store_merges_translated_rows(xmind):
    base = xmind.mind.news_store("train")
    store = xmind.news_store("train")
    assert store.title.shape[0] == base.title.shape[0] + 60
    # translated row inherits category from the English article
    r_en = store.nid2row["N5"]
    r_fi = store.nid2row["N5_fin"]
    assert store.category[r_en] == store.category[r_fi]
    # but has different (translated) tokens
    assert not np.array_equal(store.title[r_en], store.title[r_fi])


def test_bilingual_mixing_train(xmind):
    imp = xmind.impressions("train")
    store = xmind.news_store("train")
    n_translated_rows = np.sum(
        np.concatenate([imp.hist_flat, imp.cand_flat]) > xmind.mind.news_store("train").title.shape[0] - 1
    )
    assert n_translated_rows > 0  # mixing actually replaced some


def test_zero_shot_test_split(xmind):
    imp = xmind.impressions("test")
    base_rows = xmind.mind.news_store("test").title.shape[0]
    # pct_tgt_lang_test=1.0: every candidate with an available translation is
    # replaced -> many rows beyond the base store
    frac = np.mean(imp.cand_flat >= base_rows)
    assert frac > 0.3


def test_mixing_determinism(xmind):
    i1 = xmind.impressions("train")
    i2 = xmind.impressions("train")
    np.testing.assert_array_equal(i1.cand_flat, i2.cand_flat)
    np.testing.assert_array_equal(i1.hist_flat, i2.hist_flat)


def test_extended_vocab_assigns_ids_to_translated_words(xmind):
    """Target-language words get NEW vocab ids (the PLM-universal-vocab
    analog) so translated titles carry real token signal, not OOV zeros."""
    store = xmind.news_store("train")
    r_fi = store.nid2row["N5_fin"]
    # translated title must contain nonzero token ids
    assert store.title[r_fi].sum() > 0
    ext, n_base = xmind._ensure_extended_vocab()
    assert len(ext) > n_base
    assert xmind.vocab_size() == len(ext) + 1


def test_aligned_embeddings_extend_matrix(tmp_path):
    """ensure_word_embeddings builds the extended matrix with aligned-file
    vectors for translated words (MUSE-style shared space)."""
    data_dir = str(tmp_path)
    write_mind_fixture(data_dir, num_news=40, num_train_behaviors=40,
                       num_dev_behaviors=20)
    mind = MINDData(MINDConfig(data_dir=data_dir, dataset_size="demo",
                               sentiment_annotator="lexicon",
                               word_embeddings_fpath=os.path.join(data_dir, "glove_demo.txt"),
                               word_embed_dim=8))
    # tiny glove for the base vocab
    mind.news_store("train")
    from newsreclib_tpu.data.mind import _load_idx_map

    base_map = _load_idx_map(mind.map_path("word2index"))
    words = list(base_map)[:5]
    with open(os.path.join(data_dir, "glove_demo.txt"), "w") as f:
        for i, w in enumerate(words):
            f.write(w + " " + " ".join(str(float(i + 1)) for _ in range(8)) + "\n")
    # rebuild matrix now that glove exists
    from newsreclib_tpu.data.embeddings import build_embedding_matrix

    build_embedding_matrix(
        base_map, os.path.join(data_dir, "glove_demo.txt"), 8,
        out_fpath=os.path.join(mind.split_dir("train"), "transformed_word_embeddings.npy"),
    )
    # translated news + aligned file: fin twin of words[0] shares its vector
    for split in ("train", "dev"):
        d = os.path.join(data_dir, "xMIND", "fin", split)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "news.tsv"), "w") as f:
            f.write(f"N1\tfin_{words[0]} fin_{words[1]}\t\n")
    with open(os.path.join(data_dir, "xMIND", "fin", "aligned_embeddings.txt"), "w") as f:
        f.write(f"fin_{words[0]} " + " ".join("1.0" for _ in range(8)) + "\n")

    x = XMINDData(mind, XMINDConfig(tgt_lang="fin"))
    emb_dir = x.ensure_word_embeddings()
    ext, n_base = x._ensure_extended_vocab()
    mat = np.load(os.path.join(emb_dir, "transformed_word_embeddings.npy"))
    assert mat.shape[0] == len(ext) + 1
    # aligned word copied exactly; base rows untouched
    np.testing.assert_allclose(mat[ext[f"fin_{words[0]}"]], np.full(8, 1.0))
    np.testing.assert_allclose(mat[base_map[words[0]]], np.full(8, 1.0))
    # un-aligned translated word got a (random) row, not zeros
    assert np.abs(mat[ext[f"fin_{words[1]}"]]).sum() > 0
