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
