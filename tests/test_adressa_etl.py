"""Adressa ETL tests on a synthetic raw tar.gz fixture (no network)."""

import os

import numpy as np
import pytest

from newsreclib_tpu.data.adressa import AdressaConfig, AdressaData
from newsreclib_tpu.data.batching import EvalBatcher, TrainBatcher
from newsreclib_tpu.data.testing import write_adressa_fixture


@pytest.fixture(scope="module")
def adressa(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("adressa"))
    write_adressa_fixture(data_dir)
    return AdressaData(AdressaConfig(data_dir=data_dir, neg_num=10, seed=7))


def test_raw_processing(adressa):
    adressa.prepare_raw()
    root = adressa.root
    assert os.path.exists(os.path.join(root, "news.tsv"))
    assert os.path.exists(os.path.join(root, "behaviors_7.tsv"))
    assert os.path.exists(os.path.join(root, "dev", "behaviors_7.tsv"))
    assert os.path.exists(os.path.join(root, "test", "behaviors_7.tsv"))


def test_synthesized_impressions(adressa):
    imp = adressa.impressions("train")
    assert len(imp) > 0
    for i in range(min(20, len(imp))):
        cands, labels = imp.cands(i)
        # 1 positive + up to neg_num negatives
        assert labels.sum() == 1
        assert labels[0] == 1  # positive is the first listed candidate
        assert len(cands) <= 11
        # negatives are distinct from the positive
        assert len(set(cands.tolist())) == len(cands)


def test_test_histories_include_train_clicks(adressa):
    train = adressa.impressions("train")
    test = adressa.impressions("test")
    # same user's test history must be at least as long as their train history
    train_hist = {}
    for i in range(len(train)):
        u = int(train.user_idx[i])
        train_hist[u] = max(train_hist.get(u, 0), len(train.hist(i)))
    checked = 0
    for i in range(len(test)):
        u = int(test.user_idx[i])
        if u in train_hist:
            assert len(test.hist(i)) >= train_hist[u]
            checked += 1
    assert checked > 0


def test_dev_test_split_ratio(adressa):
    dev = adressa.impressions("val")
    test = adressa.impressions("test")
    total = len(dev) + len(test)
    assert total > 0
    assert abs(len(dev) / total - 0.2) < 0.1


def test_store_and_batching(adressa):
    store = adressa.news_store()
    assert store.num_news > 0
    assert adressa.vocab_size() > 10
    classes = adressa.num_classes()
    assert classes["category"] >= 3
    imp = adressa.impressions("train")
    batch = next(iter(TrainBatcher(store, imp, batch_size=4, max_history_len=8,
                                   u_bucket_min=64).epoch(0)))
    assert batch.cand_idx.shape == (4, 5)
    ev = next(iter(EvalBatcher(store, adressa.impressions("test"),
                               max_history_len=8, target_cells=64, u_bucket_min=64)))
    assert ev.labels.sum() >= 1


def test_determinism_same_seed(tmp_path_factory):
    d1 = str(tmp_path_factory.mktemp("a1"))
    write_adressa_fixture(d1, seed=3)
    a1 = AdressaData(AdressaConfig(data_dir=d1, neg_num=5, seed=11))
    a1.prepare_raw()
    d2 = str(tmp_path_factory.mktemp("a2"))
    write_adressa_fixture(d2, seed=3)
    a2 = AdressaData(AdressaConfig(data_dir=d2, neg_num=5, seed=11))
    a2.prepare_raw()
    with open(os.path.join(a1.root, "behaviors_11.tsv")) as f1, \
         open(os.path.join(a2.root, "behaviors_11.tsv")) as f2:
        assert f1.read() == f2.read()
