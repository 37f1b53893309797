"""PLM-mode ETL: HF tokenizer path with a local (offline) tokenizer."""

import os

import numpy as np
import pytest

from newsreclib_tpu.data.mind import MINDConfig, MINDData
from newsreclib_tpu.data.testing import write_mind_fixture


@pytest.fixture(scope="module")
def tokenizer_dir(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = str(tmp_path_factory.mktemp("tok"))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        "the", "a", "of", "to", "in", "on", "for", "with", "wins", "market",
        "team", "game", "##s", "world", "new", "day", "week",
    ]
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=os.path.join(d, "vocab.txt"), lowercase=True)
    tok.save_pretrained(d)
    return d


def test_plm_mode_store(tokenizer_dir, tmp_path):
    data_dir = str(tmp_path / "mind")
    write_mind_fixture(data_dir, num_news=40, num_train_behaviors=40, num_dev_behaviors=20)
    mind = MINDData(
        MINDConfig(
            data_dir=data_dir, dataset_size="demo", sentiment_annotator="lexicon",
            use_plm=True, plm_tokenizer=tokenizer_dir, tokenizer_max_len=24,
        )
    )
    store = mind.news_store("train")
    assert store.title.shape[1] == 24
    # CLS (id 2) starts every non-empty title
    valid_rows = store.title[1:][store.title[1:, 0] != 0]
    assert np.all(valid_rows[:, 0] == 2)
    # PLM and word-level stores coexist (separate caches)
    mind_w = MINDData(
        MINDConfig(data_dir=data_dir, dataset_size="demo", sentiment_annotator="lexicon")
    )
    store_w = mind_w.news_store("train")
    assert store_w.title.shape[1] == 30
    assert os.path.exists(os.path.join(mind.split_dir("train"), "news_store_plm.npz"))
    assert os.path.exists(os.path.join(mind.split_dir("train"), "news_store.npz"))


def test_plm_store_feeds_plm_model(tokenizer_dir, tmp_path):
    import jax

    from newsreclib_tpu.data.batching import TrainBatcher
    from newsreclib_tpu.models.components.plm import PLMTextEncoder, TransformerEncoder
    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.training.state import create_train_state, make_optimizer

    data_dir = str(tmp_path / "mind2")
    write_mind_fixture(data_dir, num_news=40, num_train_behaviors=40, num_dev_behaviors=20)
    mind = MINDData(
        MINDConfig(
            data_dir=data_dir, dataset_size="demo", sentiment_annotator="lexicon",
            use_plm=True, plm_tokenizer=tokenizer_dir, tokenizer_max_len=24,
        )
    )
    store = mind.news_store("train")
    batch = next(iter(TrainBatcher(store, mind.impressions("train"), batch_size=4,
                                   max_history_len=6, u_bucket_min=64).epoch(0)))
    enc = TransformerEncoder(vocab_size=30, hidden_dim=32, num_layers=2,
                             num_heads=4, intermediate_dim=64, max_position=32)
    plm = PLMTextEncoder(encoder=enc, use_mhsa=True, num_heads=4, query_dim=16)
    model = NRMS(vocab_size=30, embed_dim=32, num_heads=4, query_dim=16,
                 text_encoder_module=plm)
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer())
    scores, _ = model.apply({"params": state.params}, batch, deterministic=True)
    assert np.all(np.isfinite(np.asarray(scores)))
