"""Parallelism tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsreclib_tpu.parallel.embedding import sharded_lookup
from newsreclib_tpu.parallel.mesh import make_mesh


def test_sharded_embedding_lookup_matches_dense():
    mesh = make_mesh(model_axis=2)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, size=(5, 7)).astype(np.int32))
    got = sharded_lookup(table, ids, mesh)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sharded_lookup_under_jit():
    mesh = make_mesh(model_axis=4)
    table = jnp.arange(32 * 8, dtype=jnp.float32).reshape(32, 8)
    ids = jnp.asarray([0, 31, 7, 16], dtype=jnp.int32)
    f = jax.jit(lambda t, i: sharded_lookup(t, i, mesh))
    np.testing.assert_allclose(
        np.asarray(f(table, ids)), np.asarray(jnp.take(table, ids, axis=0))
    )


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


# ---- production-path parity: mesh vs single device ------------------------


class _FixedBatcher:
    def __init__(self, batches):
        self._batches = batches
        self.batch_size = batches[0].labels.shape[0]

    def epoch(self, _i):
        return iter(self._batches)


def _synthetic_batches(n_batches=10, batch_size=8):
    from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch

    cfg = SyntheticConfig(vocab_size=300, title_len=12)
    rng = np.random.default_rng(7)
    return [
        make_batch(rng, batch_size=batch_size, hist_len=6, num_candidates=5,
                   unique_news=32, cfg=cfg)
        for _ in range(n_batches)
    ], cfg


def _nrms_state(cfg, batch):
    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.training.state import create_train_state, make_optimizer

    model = NRMS(vocab_size=cfg.vocab_size, embed_dim=48, num_heads=4, query_dim=24)
    state = create_train_state(model, batch, jax.random.key(3), make_optimizer(1e-3))
    return model, state


def test_mesh_trainer_matches_single_device():
    """The sharded production train path must compute the SAME optimization
    trajectory as single-device: same batches → same per-step losses and
    final params (VERDICT r1 item 2 'done' criterion)."""
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.training.trainer import Trainer, TrainerConfig

    batches, cfg = _synthetic_batches(n_batches=10, batch_size=8)
    tc = TrainerConfig(max_epochs=1, log_every_n_steps=1000, ckpt_dir=None)

    model, state1 = _nrms_state(cfg, batches[0])
    t_single = Trainer(state1, cross_entropy_loss, tc)
    out_single = t_single.train_epoch(_FixedBatcher(batches), 0)

    _, state8 = _nrms_state(cfg, batches[0])  # same init key → same params
    mesh = make_mesh(jax.devices(), model_axis=1)  # pure 8-way DP
    t_mesh = Trainer(state8, cross_entropy_loss, tc, mesh=mesh, model=model)
    out_mesh = t_mesh.train_epoch(_FixedBatcher(batches), 0)

    assert abs(out_single["train/loss"] - out_mesh["train/loss"]) < 1e-5
    for a, b in zip(jax.tree.leaves(t_single.state.params),
                    jax.tree.leaves(t_mesh.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_mesh_trainer_row_sharded_embeddings():
    """data×model mesh: embedding rows sharded over the model axis must not
    change the trajectory either."""
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.training.trainer import Trainer, TrainerConfig

    batches, cfg = _synthetic_batches(n_batches=4, batch_size=8)
    tc = TrainerConfig(max_epochs=1, log_every_n_steps=1000, ckpt_dir=None)

    model, state1 = _nrms_state(cfg, batches[0])
    t_single = Trainer(state1, cross_entropy_loss, tc)
    out_single = t_single.train_epoch(_FixedBatcher(batches), 0)

    _, state_m = _nrms_state(cfg, batches[0])
    mesh = make_mesh(jax.devices(), model_axis=2)  # 4×2 data×model
    t_mesh = Trainer(state_m, cross_entropy_loss, tc, mesh=mesh, model=model)
    out_mesh = t_mesh.train_epoch(_FixedBatcher(batches), 0)
    assert abs(out_single["train/loss"] - out_mesh["train/loss"]) < 1e-5


def test_adversarial_trainer_on_mesh():
    """SentiDebias alternating G/D training over the 8-device DP mesh:
    finite losses and loss trajectory matching single-device."""
    from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
    from newsreclib_tpu.models import fair_rec
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.models.fair_rec import create_sentidebias_state
    from newsreclib_tpu.training.adversarial import AdversarialTrainer
    from newsreclib_tpu.training.trainer import TrainerConfig

    cfg = SyntheticConfig(vocab_size=200, title_len=10)
    rng = np.random.default_rng(5)
    batches = [
        make_batch(rng, batch_size=8, hist_len=5, num_candidates=5,
                   unique_news=24, cfg=cfg)
        for _ in range(3)
    ]

    def build_state():
        gen = fair_rec.SentiDebiasGenerator(
            vocab_size=200, num_sent_classes=3, embed_dim=24, num_heads=4,
            query_dim=12, sent_embed_dim=8)
        disc = fair_rec.SentiDebiasDiscriminator(hidden_dim=16, num_sent_classes=3)
        return create_sentidebias_state(gen, disc, batches[0], jax.random.key(0))

    tc = TrainerConfig(max_epochs=1, log_every_n_steps=1000, ckpt_dir=None)

    class _FB(_FixedBatcher):
        pass

    t_single = AdversarialTrainer(build_state(), cross_entropy_loss, tc)
    h_single = t_single.fit(_FB(batches))

    mesh = make_mesh(jax.devices(), model_axis=1)
    t_mesh = AdversarialTrainer(build_state(), cross_entropy_loss, tc, mesh=mesh)
    h_mesh = t_mesh.fit(_FB(batches))

    for k in ("train/g_loss", "train/d_loss"):
        assert np.isfinite(h_mesh[k])
        assert abs(h_single[k] - h_mesh[k]) < 1e-4, k


def test_mesh_cached_eval_matches_unmeshed(tmp_path_factory):
    """CachedScorer on a data-sharded mesh must reproduce the single-device
    cached metrics (incl. pooled AUC and loss)."""
    from newsreclib_tpu.data.mind import MINDConfig, MINDData
    from newsreclib_tpu.data.testing import write_mind_fixture
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.serving import CachedScorer
    from newsreclib_tpu.data.batching import TrainBatcher
    from newsreclib_tpu.training.state import create_train_state, make_optimizer
    from newsreclib_tpu.models.general_rec import NRMS

    data_dir = str(tmp_path_factory.mktemp("meshserve"))
    write_mind_fixture(data_dir, num_news=100, num_train_behaviors=60,
                       num_dev_behaviors=40)
    mind = MINDData(MINDConfig(data_dir=data_dir, dataset_size="demo",
                               sentiment_annotator="lexicon"))
    store, imp = mind.news_store("test"), mind.impressions("test")
    model = NRMS(vocab_size=mind.vocab_size(), embed_dim=48, num_heads=4, query_dim=24)
    example = next(iter(TrainBatcher(store, mind.impressions("train"), batch_size=4,
                                     max_history_len=8, u_bucket_min=64).epoch(0)))
    state = create_train_state(model, example, jax.random.key(0), make_optimizer())

    plain = CachedScorer(model, loss_fn=cross_entropy_loss).evaluate(
        state.params, store, imp, max_history_len=8, target_cells=64)
    mesh = make_mesh(jax.devices(), model_axis=1)
    meshed = CachedScorer(model, loss_fn=cross_entropy_loss, mesh=mesh).evaluate(
        state.params, store, imp, max_history_len=8, target_cells=64)
    assert set(plain) == set(meshed)
    for k in plain:
        assert abs(plain[k] - meshed[k]) < 1e-5, k


def test_mesh_trainer_with_split_batches():
    """Length-bucketed batches (RecBatch.news2) over the 8-way DP mesh:
    shard_batch must replicate BOTH news segments while data-sharding the
    index matrices, and the trajectory must match single-device."""
    from newsreclib_tpu.data.batching import split_news_by_length
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.training.trainer import Trainer, TrainerConfig

    batches, cfg = _synthetic_batches(n_batches=6, batch_size=8)

    def split(b):
        news, news2, h, c = split_news_by_length(
            b.news, b.hist_idx, b.cand_idx, 8, min_tail=8
        )
        return b._replace(news=news, news2=news2, hist_idx=h, cand_idx=c)

    split_batches = [split(b) for b in batches]
    assert any(b.news2 is not None for b in split_batches)
    tc = TrainerConfig(max_epochs=1, log_every_n_steps=1000, ckpt_dir=None)

    model, state1 = _nrms_state(cfg, split_batches[0])
    t_single = Trainer(state1, cross_entropy_loss, tc)
    out_single = t_single.train_epoch(_FixedBatcher(split_batches), 0)

    _, state8 = _nrms_state(cfg, split_batches[0])
    mesh = make_mesh(jax.devices(), model_axis=1)
    t_mesh = Trainer(state8, cross_entropy_loss, tc, mesh=mesh, model=model)
    out_mesh = t_mesh.train_epoch(_FixedBatcher(split_batches), 0)
    assert abs(out_single["train/loss"] - out_mesh["train/loss"]) < 1e-5


def test_mindlarge_scale_row_sharded_embeddings():
    """MINDlarge-scale vocab stress (VERDICT r3 item 6): a 524,288-row
    embedding table trained with model-axis row sharding on the 8-device
    mesh.  Asserts per-device bytes ∝ rows/shards for BOTH the param table
    and its adam moments, trains steps to a finite loss, and builds the
    serving vector table at 100k-article scale through the mesh encode."""
    import jax.numpy as jnp

    from newsreclib_tpu.data.batch import NewsFeatures, RecBatch
    from newsreclib_tpu.data.news_store import NewsStore
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.training.state import create_train_state, make_optimizer
    from newsreclib_tpu.training.trainer import Trainer, TrainerConfig

    VOCAB = 524_288          # ≥0.5M rows — the MINDlarge GloVe regime
    EMBED, HEADS, QUERY, TITLE = 64, 4, 32, 8
    NUM_NEWS = 100_000
    rng = np.random.default_rng(0)

    title = np.zeros((NUM_NEWS + 1, TITLE), dtype=np.int32)
    title[1:] = rng.integers(2, VOCAB, size=(NUM_NEWS, TITLE))
    title[1:, TITLE - 2:] = 0  # some padding
    store = NewsStore(nid2row={f"N{i}": i for i in range(1, NUM_NEWS + 1)},
                      title=title)

    B, H, C, U = 8, 6, 5, 64
    news = NewsFeatures(
        title=jnp.asarray(title[:U]), title_mask=jnp.asarray(title[:U] != 0),
        abstract=None, abstract_mask=None, title_entities=None,
        title_entities_mask=None, abstract_entities=None,
        abstract_entities_mask=None, category=None, subcategory=None,
        sentiment=None, sentiment_score=None,
    )
    hist_idx = rng.integers(1, U, size=(B, H)).astype(np.int32)
    cand_idx = rng.integers(1, U, size=(B, C)).astype(np.int32)
    labels = np.zeros((B, C), dtype=np.float32)
    labels[:, 0] = 1.0
    batch = RecBatch(
        news=news, news2=None, hist_idx=jnp.asarray(hist_idx),
        hist_mask=jnp.asarray(hist_idx != 0), cand_idx=jnp.asarray(cand_idx),
        cand_mask=jnp.ones((B, C), dtype=bool), labels=jnp.asarray(labels),
        user_idx=None, impression_valid=jnp.ones(B, dtype=bool),
    )

    model = NRMS(vocab_size=VOCAB, embed_dim=EMBED, num_heads=HEADS,
                 query_dim=QUERY)
    state = create_train_state(model, batch, jax.random.key(0),
                               make_optimizer(1e-3))
    mesh = make_mesh(jax.devices(), model_axis=4)  # data 2 × model 4
    trainer = Trainer(state, cross_entropy_loss,
                      TrainerConfig(max_epochs=1, ckpt_dir=None),
                      mesh=mesh, model=model)

    # --- per-device memory ∝ rows/shards, for table AND adam moments ---
    def emb_leaves(tree):
        out = []
        def walk(path, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(path + [k], v)
            elif path[-2:] == ["embedding", "embedding"]:
                out.append(node)
        walk([], tree)
        return out

    table = emb_leaves(trainer.state.params)
    assert table, "NRMS must expose the word embedding table"
    table = table[0]
    full_bytes = VOCAB * EMBED * 4  # vocab rows (+1 pad handled below)
    shard_rows = {s.data.shape[0] for s in table.addressable_shards}
    assert shard_rows == {VOCAB // 4}, shard_rows  # (VOCAB+pad? see below)
    import jax as _jax
    mu_nu = [l for l in _jax.tree.leaves(
        _jax.tree.map(lambda x: x, trainer.state.opt_state))
        if getattr(l, "ndim", 0) == 2 and l.shape[0] == table.shape[0]]
    assert mu_nu, "adam moments for the table must exist"
    for m in mu_nu:
        rows = {s.data.shape[0] for s in m.addressable_shards}
        assert rows == {table.shape[0] // 4}, (
            "adam moments must be row-sharded like the table", rows)

    # --- a few production train steps ---
    trainer.cfg.limit_train_batches = 2
    out = trainer.train_epoch(_FixedBatcher([batch, batch]), 0)
    assert np.isfinite(out["train/loss"])

    # --- serving table build at scale through the mesh ---
    from newsreclib_tpu.serving import build_news_vector_table

    vec_table = build_news_vector_table(
        model, trainer.state.params, store, batch_size=8192, mesh=mesh,
        split_title_len=None,
    )
    assert vec_table.shape == (NUM_NEWS + 1, EMBED)
    sample = np.asarray(vec_table[1:64])
    assert np.all(np.isfinite(sample)) and np.abs(sample).sum() > 0


# ---- tensor parallelism for the PLM tower ---------------------------------


def _plm_nrms_state(cfg, batch, optimizer=None):
    """Tiny NRMS with a 2-layer transformer text tower (PLM path)."""
    import optax

    from newsreclib_tpu.models.components.plm import (
        PLMTextEncoder,
        TransformerEncoder,
    )
    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.training.state import create_train_state, make_optimizer

    enc = TransformerEncoder(
        vocab_size=cfg.vocab_size, hidden_dim=32, num_layers=2, num_heads=4,
        intermediate_dim=64, max_position=64, dropout=0.0,
    )
    tower = PLMTextEncoder(encoder=enc, use_mhsa=True, num_heads=4,
                           query_dim=16, dropout=0.0)
    model = NRMS(vocab_size=cfg.vocab_size, embed_dim=32, num_heads=4,
                 query_dim=16, text_encoder_module=tower)
    state = create_train_state(model, batch, jax.random.key(3),
                               optimizer or make_optimizer(1e-3))
    return model, state


def test_tp_transformer_param_shardings():
    """q/k/v/ff1 kernels column-sharded, attn_out/ff2 row-sharded over the
    model axis; biases of column-parallel layers sharded; everything in the
    layout dimensionally consistent (heads divisible by model shards)."""
    from jax.sharding import PartitionSpec as P

    from newsreclib_tpu.parallel.mesh import param_shardings

    batches, cfg = _synthetic_batches(n_batches=1, batch_size=8)
    _, state = _plm_nrms_state(cfg, batches[0])
    mesh = make_mesh(jax.devices(), model_axis=4)
    sh = param_shardings(state.params, mesh, tp_transformer=True)
    flat = {
        "/".join(str(p.key) for p in path if hasattr(p, "key")): s
        for path, s in jax.tree_util.tree_leaves_with_path(sh)
    }
    col = [k for k in flat if k.endswith(("q/kernel", "k/kernel", "v/kernel",
                                          "ff1/kernel")) and "layer_" in k]
    row = [k for k in flat if k.endswith(("attn_out/kernel", "ff2/kernel"))
           and "layer_" in k]
    assert len(col) == 2 * 4 and len(row) == 2 * 2  # 2 layers
    for k in col:
        assert flat[k].spec == P(None, "model"), k
    for k in row:
        assert flat[k].spec == P("model", None), k
    # the NRMS head (non-PLM) params stay replicated
    assert all(flat[k].spec == P() for k in flat
               if "layer_" not in k and not k.endswith("embedding/embedding"))


def test_mesh_trainer_tp_transformer_matches_single_device():
    """Megatron-style TP over the model axis must reproduce the single-device
    trajectory exactly (GSPMD relayouts, not math changes): same per-epoch
    loss and same final params."""
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.training.trainer import Trainer, TrainerConfig

    import optax

    batches, cfg = _synthetic_batches(n_batches=4, batch_size=8)
    tc = TrainerConfig(max_epochs=1, log_every_n_steps=1000, ckpt_dir=None)
    # SGD, not adam: adam normalizes near-zero gradients into lr-scale
    # sign-like updates, which amplifies the fp32 reduction-order noise of
    # the TP psum into O(lr) param deltas; with SGD a relayouted-but-equal
    # computation must land within fp32 rounding of the same params
    opt = optax.sgd(1e-2)

    model, s1 = _plm_nrms_state(cfg, batches[0], optimizer=opt)
    t1 = Trainer(s1, cross_entropy_loss, tc)
    out1 = t1.train_epoch(_FixedBatcher(batches), 0)

    _, sm = _plm_nrms_state(cfg, batches[0], optimizer=opt)  # same init
    mesh = make_mesh(jax.devices(), model_axis=4)  # 2×4 data×model
    tcm = TrainerConfig(max_epochs=1, log_every_n_steps=1000, ckpt_dir=None,
                        tp_transformer=True)
    tm = Trainer(sm, cross_entropy_loss, tcm, mesh=mesh, model=model)
    outm = tm.train_epoch(_FixedBatcher(batches), 0)

    assert abs(out1["train/loss"] - outm["train/loss"]) < 1e-4
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(tm.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_tp_transformer_with_frozen_layers():
    """TP sharding must compose with optimizer-level layer freezing: the
    multi_transform opt state (MaskedNode leaves) places cleanly on the mesh,
    frozen-layer params stay bit-identical through a TP epoch, and trainable
    params still match the single-device trajectory."""
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.models.components.plm import plm_freeze_labels
    from newsreclib_tpu.training.state import create_train_state, make_optimizer
    from newsreclib_tpu.training.trainer import Trainer, TrainerConfig

    batches, cfg = _synthetic_batches(n_batches=3, batch_size=8)

    def build():
        from newsreclib_tpu.models.components.plm import (
            PLMTextEncoder,
            TransformerEncoder,
        )
        from newsreclib_tpu.models.general_rec import NRMS

        enc = TransformerEncoder(
            vocab_size=cfg.vocab_size, hidden_dim=32, num_layers=2,
            num_heads=4, intermediate_dim=64, max_position=64, dropout=0.0,
        )
        tower = PLMTextEncoder(encoder=enc, use_mhsa=True, num_heads=4,
                               query_dim=16, dropout=0.0)
        model = NRMS(vocab_size=cfg.vocab_size, embed_dim=32, num_heads=4,
                     query_dim=16, text_encoder_module=tower)
        opt = lambda params: make_optimizer(
            1e-3, freeze_labels=plm_freeze_labels(params, frozen_layers=[0]))
        state = create_train_state(model, batches[0], jax.random.key(3), opt)
        return model, state

    def named_leaves(params):
        return {
            "/".join(str(p.key) for p in path if hasattr(p, "key")): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        }

    model, state = build()
    before = named_leaves(state.params)
    assert any("layer_0" in k for k in before)

    mesh = make_mesh(jax.devices(), model_axis=2)
    tc = TrainerConfig(max_epochs=1, log_every_n_steps=1000, ckpt_dir=None,
                       tp_transformer=True)
    tm = Trainer(state, cross_entropy_loss, tc, mesh=mesh, model=model)
    out = tm.train_epoch(_FixedBatcher(batches), 0)
    assert np.isfinite(out["train/loss"])

    after = named_leaves(tm.state.params)
    changed_l1 = 0
    for name, b in before.items():
        if "layer_0" in name:  # frozen: bit-identical through the TP epoch
            np.testing.assert_array_equal(after[name], b, err_msg=name)
        elif "layer_1" in name:
            changed_l1 += int(not np.array_equal(after[name], b))
    assert changed_l1 > 0  # the unfrozen layer actually trained


def test_fit_with_tp_transformer_end_to_end(tmp_path_factory):
    """Full production loop under TP: Trainer.fit (train epochs + cached
    val eval + checkpointing) on a 4×2 data×model mesh with the PLM tower
    tensor-parallel must match the single-device fit's val metrics."""
    from newsreclib_tpu.data.batching import EvalBatcher, TrainBatcher
    from newsreclib_tpu.data.mind import MINDConfig, MINDData
    from newsreclib_tpu.data.testing import write_mind_fixture
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.models.components.plm import (
        PLMTextEncoder,
        TransformerEncoder,
    )
    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.training.state import create_train_state, make_optimizer
    from newsreclib_tpu.training.trainer import Trainer, TrainerConfig

    data_dir = str(tmp_path_factory.mktemp("tpfit"))
    write_mind_fixture(data_dir, num_news=80, num_train_behaviors=64,
                       num_dev_behaviors=24)
    mind = MINDData(MINDConfig(data_dir=data_dir, dataset_size="demo",
                               sentiment_annotator="lexicon"))
    store = mind.news_store("train")
    train_b = TrainBatcher(store, mind.impressions("train"), batch_size=8,
                           max_history_len=8, u_bucket_min=64)
    val_b = EvalBatcher(store, mind.impressions("val"), max_history_len=8,
                        target_cells=64, u_bucket_min=64)

    def build():
        enc = TransformerEncoder(
            vocab_size=mind.vocab_size(), hidden_dim=32, num_layers=2,
            num_heads=4, intermediate_dim=64, max_position=64, dropout=0.0,
        )
        tower = PLMTextEncoder(encoder=enc, use_mhsa=True, num_heads=4,
                               query_dim=16, dropout=0.0)
        model = NRMS(vocab_size=mind.vocab_size(), embed_dim=32, num_heads=4,
                     query_dim=16, text_encoder_module=tower)
        example = next(iter(train_b.epoch(0)))
        state = create_train_state(model, example, jax.random.key(0),
                                   make_optimizer(1e-3))
        return model, state

    model, s1 = build()
    tc = dict(max_epochs=2, log_every_n_steps=100, patience=5)
    t1 = Trainer(s1, cross_entropy_loss, TrainerConfig(**tc), model=model)
    h1 = t1.fit(train_b, val_b)

    _, sm = build()
    mesh = make_mesh(jax.devices(), model_axis=2)
    tm = Trainer(sm, cross_entropy_loss,
                 TrainerConfig(tp_transformer=True, **tc),
                 mesh=mesh, model=model)
    hm = tm.fit(train_b, val_b)

    assert set(h1) == set(hm)
    for k in ("val/loss", "val/auc"):
        assert abs(h1[k] - hm[k]) < 5e-3, (k, h1[k], hm[k])
