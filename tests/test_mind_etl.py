"""MIND ETL conformance tests on a synthetic raw fixture (no network).

Checks the cache/artifact contract (SURVEY.md §2.2) and batching shape
invariants (the reference's only dataset assertions are behavior counts and
``len(batch['user_idx']) == batch_size``, ``tests/test_datamodules.py``).
"""

import os

import numpy as np
import pandas as pd
import pytest

from newsreclib_tpu.data.batching import EvalBatcher, TrainBatcher
from newsreclib_tpu.data.mind import MINDConfig, MINDData
from newsreclib_tpu.data.testing import write_mind_fixture


@pytest.fixture(scope="module")
def mind(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("mind"))
    write_mind_fixture(data_dir, num_news=120, num_train_behaviors=150, num_dev_behaviors=60)
    cfg = MINDConfig(
        data_dir=data_dir,
        dataset_size="demo",
        word_embeddings_fpath=os.path.join(data_dir, "glove_demo.txt"),
        sentiment_annotator="lexicon",
    )
    return MINDData(cfg)


def test_news_parsing_and_artifact_contract(mind):
    news = mind.load_news("train")
    d = mind.split_dir("train")
    for f in [
        "parsed_news.tsv", "word2index.tsv", "entity2index.tsv", "categ2index.tsv",
        "subcateg2index.tsv", "sentiment2index.tsv", "transformed_word_embeddings.npy",
        "transformed_entity_embeddings.npy",
    ]:
        assert os.path.exists(os.path.join(d, f)), f
    assert len(news) == 120
    assert news["category_class"].min() >= 1  # all known on train
    assert set(news["sentiment_label"].unique()) <= {"positive", "neutral", "negative"}
    # word ids are 1-based dense
    w2i = pd.read_table(os.path.join(d, "word2index.tsv"))
    assert w2i["index"].min() == 1
    assert w2i["index"].max() == len(w2i)
    emb = np.load(os.path.join(d, "transformed_word_embeddings.npy"))
    assert emb.shape == (len(w2i) + 1, 300)
    assert np.all(emb[0] == 0)


def test_news_cache_roundtrip(mind):
    n1 = mind.load_news("train")
    n2 = mind.load_news("train")  # from cache
    assert n1["tokenized_title"].tolist() == n2["tokenized_title"].tolist()
    assert n1["title_entities"].tolist() == n2["title_entities"].tolist()


def test_behaviors_split_semantics(mind):
    train = mind.load_behaviors("train")
    val = mind.load_behaviors("val")
    test = mind.load_behaviors("test")
    # empty-history users dropped
    assert all(len(h) > 0 for h in train["history"])
    # time split: train+val partitions the raw train set
    assert len(train) > 0 and len(val) > 0 and len(test) > 0
    # uid2index built on train only; val/test users may map to 0
    assert os.path.exists(os.path.join(mind.split_dir("train"), "uid2index.tsv"))
    assert train["user"].min() >= 1


def test_behaviors_cache_roundtrip(mind):
    b1 = mind.load_behaviors("train")
    cache = os.path.join(mind.split_dir("train"), "train_parsed_behaviors.tsv")
    assert os.path.exists(cache)
    b2 = mind.load_behaviors("train")
    assert b1["history"].tolist() == b2["history"].tolist()
    assert b1["labels"].tolist() == b2["labels"].tolist()


def test_train_batcher_shapes(mind):
    store = mind.news_store("train")
    imp = mind.impressions("train")
    batcher = TrainBatcher(store, imp, batch_size=8, max_history_len=10,
                           neg_sampling_ratio=4, u_bucket_min=64)
    batches = list(batcher.epoch(0))
    assert len(batches) == len(batcher)
    for b in batches:
        assert b.hist_idx.shape == (8, 10)
        assert b.cand_idx.shape == (8, 5)
        assert b.labels.sum(axis=1).tolist() == [1.0] * 8  # exactly one positive
        assert b.news.title.shape[1] == 30
        # dedup indices in range
        assert b.cand_idx.max() < b.news.title.shape[0]
        # positive slot points at a real article
        pos = np.take_along_axis(b.cand_idx, np.argmax(b.labels, 1)[:, None], 1)
        assert (pos > 0).all()
        # batch invariant from the reference test suite
        assert len(b.user_idx) == 8


def test_train_batcher_determinism(mind):
    store = mind.news_store("train")
    imp = mind.impressions("train")
    b1 = next(iter(TrainBatcher(store, imp, batch_size=8, seed=3).epoch(0)))
    b2 = next(iter(TrainBatcher(store, imp, batch_size=8, seed=3).epoch(0)))
    np.testing.assert_array_equal(b1.cand_idx, b2.cand_idx)
    b3 = next(iter(TrainBatcher(store, imp, batch_size=8, seed=3).epoch(1)))
    assert not np.array_equal(b1.cand_idx, b3.cand_idx)


def test_eval_batcher_covers_all_impressions(mind):
    store = mind.news_store("test")
    imp = mind.impressions("test")
    batcher = EvalBatcher(store, imp, max_history_len=10, target_cells=64, u_bucket_min=64)
    seen = 0
    for b in batcher:
        v = np.asarray(b.impression_valid)
        seen += int(v.sum())
        # candidate counts fit the bucket; masked slots carry zero labels
        assert np.all((b.labels * ~b.cand_mask) == 0)
        # power-of-two candidate bucket
        c = b.cand_idx.shape[1]
        assert c & (c - 1) == 0
    assert seen == len(imp)


def test_eval_batch_runs_through_model(mind):
    import jax

    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.training.state import create_train_state, make_optimizer
    from newsreclib_tpu.training.steps import make_eval_step

    store = mind.news_store("test")
    imp = mind.impressions("test")
    batch = next(iter(EvalBatcher(store, imp, max_history_len=10, target_cells=64, u_bucket_min=64)))
    model = NRMS(vocab_size=mind.vocab_size(), embed_dim=60, num_heads=6, query_dim=32)
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer())
    eval_step = make_eval_step()
    scores, per_imp, valid, _ = eval_step(state, batch)
    assert np.all(np.isfinite(np.asarray(scores)))
    assert "ndcg@10" in per_imp
