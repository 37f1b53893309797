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


def test_plm_cli_with_local_weights(tokenizer_dir, tmp_path):
    """Full train.py run in PLM mode: local tiny BERT weights ported + spliced."""
    import sys

    import torch
    from transformers import BertConfig, BertModel

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from newsreclib_tpu.config.compose import compose
    import train as train_mod

    # save a tiny bert NEXT TO the tokenizer files so one dir serves both
    torch.manual_seed(0)
    model = BertModel(BertConfig(
        vocab_size=30, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=40,
    ))
    model.save_pretrained(tokenizer_dir, safe_serialization=False)

    data_dir = str(tmp_path / "mindplm")
    write_mind_fixture(data_dir, num_news=40, num_train_behaviors=40, num_dev_behaviors=20)
    cfg = compose(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "newsreclib_tpu", "configs"),
        "train",
        [
            "data=mind_small_plm", "model=nrms",
            f"data.data_dir={data_dir}/", "data.dataset_size=demo",
            f"data.plm_tokenizer={tokenizer_dir}", "data.tokenizer_max_len=16",
            "data.download=false", "data.generate_fixture=true",
            "data.batch_size=4", "data.max_history_len=6",
            "data.eval_target_cells=64", "data.u_bucket_min=64",
            "model.use_plm=true", f"model.plm_model={tokenizer_dir}",
            "model.embed_dim=32", "model.num_heads=4", "model.query_dim=16",
            "model.use_pretrained_embeddings=false",
            f"output_dir={tmp_path}/out",
            "trainer.max_epochs=1", "trainer.limit_train_batches=2",
            "trainer.limit_eval_batches=1",
        ],
    )
    metrics = train_mod.run(cfg)
    import numpy as np

    assert np.isfinite(metrics["train/loss"])
    assert "test/mrr" in metrics


def test_plm_cli_tensor_parallel(tokenizer_dir, tmp_path):
    """CLI plumbing for TP: trainer.model_axis=2 + trainer.tp_transformer=true
    runs the full train.py path with the PLM tower tensor-parallel over the
    virtual mesh's model axis (exact-parity of the layout is pinned in
    tests/test_parallel.py; this checks the config wiring end to end)."""
    import os
    import sys

    import torch
    from transformers import BertConfig, BertModel

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np

    import train as train_mod
    from newsreclib_tpu.config.compose import compose

    torch.manual_seed(0)
    model = BertModel(BertConfig(
        vocab_size=30, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=40,
    ))
    model.save_pretrained(tokenizer_dir, safe_serialization=False)

    data_dir = str(tmp_path / "mindtp")
    write_mind_fixture(data_dir, num_news=40, num_train_behaviors=40, num_dev_behaviors=20)
    cfg = compose(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "newsreclib_tpu", "configs"),
        "train",
        [
            "data=mind_small_plm", "model=nrms",
            f"data.data_dir={data_dir}/", "data.dataset_size=demo",
            f"data.plm_tokenizer={tokenizer_dir}", "data.tokenizer_max_len=16",
            "data.download=false", "data.generate_fixture=true",
            "data.batch_size=4", "data.max_history_len=6",
            "data.eval_target_cells=64", "data.u_bucket_min=64",
            "model.use_plm=true", f"model.plm_model={tokenizer_dir}",
            "model.embed_dim=32", "model.num_heads=4", "model.query_dim=16",
            "model.use_pretrained_embeddings=false",
            f"output_dir={tmp_path}/out_tp",
            "trainer.max_epochs=1", "trainer.limit_train_batches=2",
            "trainer.limit_eval_batches=1",
            "trainer.model_axis=2", "trainer.tp_transformer=true",
        ],
    )
    metrics = train_mod.run(cfg)
    assert np.isfinite(metrics["train/loss"])
    assert "test/mrr" in metrics
