"""Training entry point.

Reference analog: ``newsreclib/train.py`` (hydra main → instantiate data /
model / trainer → fit → test with best ckpt → metric dict).

Usage:
    python train.py experiment=nrms_demo
    python train.py model=naml data.batch_size=32 trainer=fdr
"""

from __future__ import annotations

import logging
import os
import sys

import jax
import numpy as np

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from newsreclib_tpu.config.compose import compose
from newsreclib_tpu.data.batching import EvalBatcher, TrainBatcher
from newsreclib_tpu.data.mind import MINDConfig, MINDData
from newsreclib_tpu.metrics.collector import RankingMetrics
from newsreclib_tpu.models.factory import build_loss, build_model, load_data_info
from newsreclib_tpu.training.loggers import make_loggers
from newsreclib_tpu.training.state import create_train_state, make_optimizer, param_count
from newsreclib_tpu.training.trainer import Trainer, TrainerConfig

log = logging.getLogger("newsreclib_tpu")


def setup_data(cfg: dict):
    """Build the dataset object (MINDData / AdressaData / XMINDData) — all
    expose the same interface (news_store / impressions / vocab_size / ...)."""
    dc = cfg["data"]
    dataset = dc.get("dataset", "mind")

    if dataset == "adressa":
        from newsreclib_tpu.data.adressa import AdressaConfig, AdressaData

        if dc.get("generate_fixture"):
            if not os.path.exists(os.path.join(dc["data_dir"], "one_week.tar.gz")):
                if dc["generate_fixture"] == "statfix":
                    # learnable preference-signal fixture (PARITY.md)
                    from newsreclib_tpu.data.statfix import write_adressa_statfix

                    write_adressa_statfix(dc["data_dir"])
                else:
                    from newsreclib_tpu.data.testing import write_adressa_fixture

                    write_adressa_fixture(dc["data_dir"])
        return AdressaData(
            AdressaConfig(
                data_dir=dc["data_dir"],
                dataset_size=dc.get("dataset_size", "one_week"),
                train_date_split=dc.get("train_date_split", 6),
                test_date_split=dc.get("test_date_split", 7),
                neg_num=dc.get("neg_num", 20),
                user_dev_size=dc.get("user_dev_size", 0.2),
                max_title_len=dc["max_title_len"],
                word_embeddings_fpath=dc.get("word_embeddings_fpath"),
                word_embed_dim=dc.get("word_embed_dim", 300),
                sentiment_annotator=dc.get("sentiment_annotator", "lexicon"),
                download=dc.get("download", False),
                seed=dc.get("seed", 42),
                use_plm=dc.get("use_plm", False),
                plm_tokenizer=dc.get("plm_tokenizer"),
                tokenizer_max_len=dc.get("tokenizer_max_len", 96),
            )
        )

    if dataset not in ("mind", "xmind"):
        raise NotImplementedError(f"dataset {dataset}")
    if dc.get("generate_fixture"):
        if not os.path.exists(
            os.path.join(dc["data_dir"], f"MIND{dc['dataset_size']}_train", "news.tsv")
        ):
            if dc["generate_fixture"] == "statfix":
                # MINDsmall-scale learnable-signal fixture (PARITY.md)
                from newsreclib_tpu.data.statfix import write_mind_small_statfix

                write_mind_small_statfix(dc["data_dir"], seed=dc.get("seed", 42))
            elif dc["generate_fixture"] == "statfix_v2":
                # v2: planted sentiment-bias + entity-topic signals (PARITY.md
                # fairness/entity demonstrations, VERDICT r4 task 1)
                from newsreclib_tpu.data.statfix import write_mind_small_statfix_v2

                write_mind_small_statfix_v2(dc["data_dir"], seed=dc.get("seed", 42))
            else:
                from newsreclib_tpu.data.testing import write_mind_fixture

                write_mind_fixture(dc["data_dir"], dataset_size=dc["dataset_size"])
    mind_cfg = MINDConfig(
        data_dir=dc["data_dir"],
        dataset_size=dc["dataset_size"],
        valid_time_split=dc["valid_time_split"],
        max_title_len=dc["max_title_len"],
        max_abstract_len=dc["max_abstract_len"],
        max_entities=dc.get("max_entities", 10),
        entity_freq_threshold=dc.get("entity_freq_threshold", 2),
        entity_confidence_threshold=dc.get("entity_confidence_threshold", 0.5),
        word_embeddings_fpath=dc.get("word_embeddings_fpath"),
        word_embed_dim=dc.get("word_embed_dim", 300),
        sentiment_annotator=dc.get("sentiment_annotator", "lexicon"),
        download=dc.get("download", False),
        seed=dc.get("seed", 0),
        use_plm=dc.get("use_plm", False),
        plm_tokenizer=dc.get("plm_tokenizer"),
        tokenizer_max_len=dc.get("tokenizer_max_len", 96),
    )
    mind = MINDData(mind_cfg)
    if dataset == "xmind":
        from newsreclib_tpu.data.xmind import XMINDConfig, XMINDData

        if dc.get("generate_fixture") == "statfix":
            # translated news + aligned embedding file companion of the
            # statfix fixture (idempotent)
            from newsreclib_tpu.data.statfix import write_xmind_statfix

            write_xmind_statfix(dc["data_dir"], lang=dc.get("tgt_lang", "fin"))

        return XMINDData(
            mind,
            XMINDConfig(
                tgt_lang=dc.get("tgt_lang", "fin"),
                bilingual_train=dc.get("bilingual_train", False),
                bilingual_test=dc.get("bilingual_test", True),
                pct_tgt_lang_train=dc.get("pct_tgt_lang_train", 0.5),
                pct_tgt_lang_test=dc.get("pct_tgt_lang_test", 1.0),
                seed=dc.get("seed", 42),
            ),
        )
    return mind


def _setup_compile_cache() -> None:
    """Persistent XLA compilation cache for CLI runs.

    The axon remote-compile queue is erratic (observed: the same LSTUR step
    compiling in 25s or queueing for 10+ minutes), so a killed/retried run
    must not recompile programs it already paid for.  Also lets sequential
    experiment runs (accuracy matrix, sweeps) share compiles.
    """
    cache_dir = os.environ.get(
        "NEWSRECLIB_COMPILE_CACHE",
        os.path.join(REPO_ROOT, ".cache", "jax_cli"),
    )
    if cache_dir and cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _setup_logging() -> None:
    # force=True: the axon sitecustomize / absl may have installed handlers
    # already, which would otherwise swallow INFO records
    logging.basicConfig(
        level=logging.INFO, format="[%(asctime)s][%(levelname)s] %(message)s", force=True
    )
    logging.getLogger("jax").setLevel(logging.WARNING)
    for noisy in ("orbax", "absl", "orbax.checkpoint"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


def _maybe_force_platform(cfg: dict) -> None:
    """cfg['platform'] (or $NEWSRECLIB_PLATFORM) overrides the JAX platform.

    Must run before the first backend use; the container sitecustomize pins
    JAX_PLATFORMS=axon, so a config update is the only reliable override.
    """
    platform = os.environ.get("NEWSRECLIB_PLATFORM") or cfg.get("platform")
    if platform:
        jax.config.update("jax_platforms", platform)


def setup_parallelism(cfg: dict):
    """Build the device mesh for the production training path.

    Reference analog: ``configs/trainer/ddp.yaml:1-9`` (Lightning DDP over N
    GPUs).  Here: ``trainer.devices`` ("all" | int, default "all") selects
    the chips; batches are sharded over the mesh's ``data`` axis and XLA
    inserts the gradient all-reduce over ICI.  ``trainer.model_axis`` > 1
    additionally row-shards embedding tables.  Multi-host (N processes) is
    entered via ``jax.distributed.initialize`` when a coordinator is
    configured, and each process loads only its impression shard
    (``parallel/data.py::shard_impressions``).

    Returns (mesh | None, process_index, process_count).
    """
    tc = cfg.get("trainer", {})
    if tc.get("distributed") or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    devices = jax.devices()
    want = tc.get("devices", "all")
    n = len(devices) if want in ("all", None, -1) else int(want)
    n = min(n, len(devices))
    model_axis = int(tc.get("model_axis", 1))
    # the data axis must divide the global batch; clamp to the largest
    # compatible device count instead of failing (debug configs use tiny
    # batches)
    batch = int(cfg.get("data", {}).get("batch_size", n))
    while n > 1 and (batch % max(n // model_axis, 1) or n % model_axis):
        n -= 1
    if n <= 1 and model_axis <= 1:
        return None, jax.process_index(), jax.process_count()
    from newsreclib_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(devices[:n], model_axis=model_axis)
    log.info("mesh: %s over %d devices (%d processes)",
             dict(mesh.shape), n, jax.process_count())
    return mesh, jax.process_index(), jax.process_count()


def build_optimizer(cfg: dict, steps_per_epoch: int = 0):
    """Optimizer from the ``model.optimizer`` config node: lr / weight decay /
    scheduler (cosine | linear_warmup) / gradient clipping, plus PLM layer
    freezing (reference freezes PLM layers by default, ``text.py:70-73``,
    and wires schedulers per model, ``abstract_recommender.py:89-108``).

    Returns a callable ``params -> GradientTransformation`` so freeze labels
    can be derived from the initialized param tree.
    """
    mc = cfg["model"]
    opt_cfg = mc.get("optimizer", {})
    total_steps = opt_cfg.get("total_steps") or (
        steps_per_epoch * cfg["trainer"].get("max_epochs", 20)
    )
    frozen_layers = mc.get("frozen_layers")
    freeze_embeddings = bool(mc.get("freeze_plm_embeddings", frozen_layers is not None))

    def factory(params):
        freeze_labels = None
        if frozen_layers is not None and mc.get("use_plm"):
            from newsreclib_tpu.models.components.plm import plm_freeze_labels

            freeze_labels = plm_freeze_labels(
                params, frozen_layers, freeze_embeddings=freeze_embeddings
            )
        return make_optimizer(
            opt_cfg.get("lr", 1e-4),
            opt_cfg.get("weight_decay", 0.0),
            scheduler=opt_cfg.get("scheduler"),
            warmup_steps=opt_cfg.get("warmup_steps", 0),
            total_steps=total_steps,
            grad_clip_norm=opt_cfg.get("grad_clip_norm"),
            freeze_labels=freeze_labels,
        )

    return factory


def _normalize_precision(p) -> "str | None":
    """trainer.precision: 16 / "bf16" / "bfloat16" → bf16 compute; 32/None →
    full f32 (reference ``configs/trainer/default.yaml:12``)."""
    if p in (None, 32, "32", "f32", "float32"):
        return None
    if p in (16, "16", "bf16", "bfloat16", "16-mixed"):
        return "bfloat16"
    raise ValueError(f"unsupported precision {p!r}")


def print_config_tree(cfg: dict, out_dir: str) -> None:
    """Pretty-print + persist the composed config (reference
    ``utils/rich_utils.py:18-76`` analog)."""
    import yaml

    tree = yaml.safe_dump(cfg, sort_keys=False, default_flow_style=False)
    log.info("composed config:\n%s", tree)
    with open(os.path.join(out_dir, "config_tree.log"), "w") as f:
        f.write(tree)


def run(cfg: dict) -> dict:
    _setup_logging()
    _maybe_force_platform(cfg)
    _setup_compile_cache()
    out_dir = cfg["output_dir"]
    os.makedirs(out_dir, exist_ok=True)
    print_config_tree(cfg, out_dir)
    log.info("devices: %s", jax.devices())

    mesh, proc_idx, proc_count = setup_parallelism(cfg)
    if proc_idx != 0:
        # rank-zero gating (reference utils/pylogger.py:15-19): non-zero
        # ranks train silently; metrics/ckpts come from process 0
        loggers_names = []
    else:
        loggers_names = cfg.get("loggers", ["stdout", "csv"])

    mind = setup_data(cfg)
    # force ETL early (reference train.py:56-58 forces prepare_data)
    from newsreclib_tpu.models.factory import title_split_margin

    trim_margin = title_split_margin(cfg["model"]["name"], cfg["model"])
    store_train = mind.news_store("train").trim_titles(margin=trim_margin)
    info = load_data_info(mind, cfg["model"])
    log.info(
        "vocab=%d users=%d categ=%d news(train)=%d",
        info.vocab_size, info.num_users, info.num_categories, store_train.num_news,
    )

    if cfg["model"]["name"] == "manner_a":
        # A-module: SupCon on aspect-labeled news batches, not slates
        # (reference configs/model/manner_a_module.yaml)
        from newsreclib_tpu.training.aspect import run_aspect_training

        metrics = run_aspect_training(
            cfg, mind, info, make_loggers(out_dir, loggers_names), out_dir
        )
        log.info("final metrics: %s", {k: round(v, 4) for k, v in metrics.items()})
        return metrics

    adversarial = bool(cfg["model"].get("adversarial"))
    if adversarial and proc_count > 1:
        raise NotImplementedError(
            "multi-host adversarial (SentiDebias) training is not wired; "
            "run it single-host or data-parallel within one host"
        )
    model = None if adversarial else build_model(cfg["model"], info)
    loss_fn = build_loss(cfg["model"])
    dc = cfg["data"]
    train_imp = mind.impressions("train")
    # multi-host: ``data.batch_size`` is the GLOBAL batch; each process
    # assembles its 1/proc_count shard and batches carry global store rows
    # (per-process dedup tables cannot form a global array — parallel/mesh.py)
    global_rows = (proc_count > 1 or bool(dc.get("global_rows"))) and not adversarial
    local_batch = dc["batch_size"]
    num_steps = None
    if proc_count > 1:
        from newsreclib_tpu.parallel.data import shard_impressions

        assert dc["batch_size"] % proc_count == 0, (
            f"global batch_size {dc['batch_size']} not divisible by "
            f"{proc_count} processes"
        )
        local_batch = dc["batch_size"] // proc_count
        # lockstep epochs: every process must run the same number of steps
        # (collectives deadlock otherwise); derive min steps over all shards
        # from the full impression set, which every process loads
        pos_per_imp = np.add.reduceat(
            train_imp.labels_flat.astype(np.int64), train_imp.cand_offsets[:-1]
        )
        num_steps = min(
            int(pos_per_imp[p::proc_count].sum()) // local_batch
            for p in range(proc_count)
        )
        train_imp = shard_impressions(train_imp, proc_idx, proc_count)
        log.info("process %d/%d: %d train impressions, %d steps/epoch",
                 proc_idx, proc_count, len(train_imp), num_steps)
    if mesh is not None:
        data_par = mesh.shape.get("data", 1)
        assert dc["batch_size"] % data_par == 0, (
            f"batch_size {dc['batch_size']} not divisible by data axis {data_par}"
        )
    # length-bucketed unique-news tables (round 3): short-title majority
    # encoded at the split width, long tail at full width — see
    # data/batching.py::split_news_by_length.  data.split_title_len: null
    # disables it.
    split_len = dc.get("split_title_len", 16)
    if split_len is not None and cfg["model"]["name"] == "dkn":
        # KCNN aligns one entity id per title position (models/components/
        # news.py KCNN truncates entities to the token width): a short
        # segment narrower than the entity width would silently drop
        # entity ids (ADVICE r3)
        ents_w = dc.get("max_entities", 10)
        assert split_len >= ents_w, (
            f"DKN needs data.split_title_len ({split_len}) >= "
            f"data.max_entities ({ents_w}); KCNN entity ids would be "
            f"truncated in the short title segment"
        )
    batcher_kwargs = dict(
        batch_size=local_batch,
        max_history_len=dc["max_history_len"],
        neg_sampling_ratio=dc["neg_sampling_ratio"],
        u_bucket_min=dc.get("u_bucket_min", 512),
        split_title_len=split_len,
        split_margin=trim_margin,
    )
    train_batcher = TrainBatcher(
        store_train,
        train_imp,
        # decorrelate per-process negative sampling / shuffling
        seed=cfg.get("seed", 0) + 7919 * proc_idx,
        global_rows=global_rows,
        num_steps=num_steps,
        **batcher_kwargs,
    )
    corpus_feats = None
    u_bucket = None
    if global_rows:
        corpus_feats = store_train.features_for(
            np.arange(store_train.title.shape[0])
        )
        u_bucket = train_batcher.global_u_bucket(dc["batch_size"])
        log.info("global-row training: corpus table %d rows, u_bucket %d",
                 store_train.title.shape[0], u_bucket)
    eval_mult = 1 if mesh is None else int(mesh.shape.get("data", 1))
    val_batcher = EvalBatcher(
        store_train, mind.impressions("val"),
        max_history_len=dc["max_history_len"],
        target_cells=dc.get("eval_target_cells", 8192),
        u_bucket_min=dc.get("u_bucket_min", 512),
        batch_multiple=eval_mult,
        split_title_len=split_len,
        split_margin=trim_margin,
    )
    test_batcher = EvalBatcher(
        mind.news_store("test").trim_titles(margin=trim_margin),
        mind.impressions("test"),
        max_history_len=dc["max_history_len"],
        target_cells=dc.get("eval_target_cells", 8192),
        u_bucket_min=dc.get("u_bucket_min", 512),
        batch_multiple=eval_mult,
        split_title_len=split_len,
        split_margin=trim_margin,
    )

    ranking = RankingMetrics(
        top_k_list=tuple(cfg["model"].get("top_k_list", (5, 10))),
        num_categ_classes=info.num_categories,
        num_sent_classes=info.num_sent_classes,
    )
    loggers = make_loggers(out_dir, loggers_names)
    tc = cfg["trainer"]
    trainer_cfg = TrainerConfig(
        max_epochs=tc["max_epochs"],
        patience=tc["patience"],
        monitor=tc.get("monitor", "loss"),
        mode=tc.get("mode", "min"),
        log_every_n_steps=tc.get("log_every_n_steps", 50),
        check_finite=tc.get("check_finite", True),
        # ckpt_path: resume fit from an existing checkpoint dir (reference
        # ``trainer.fit(ckpt_path=...)``, train.py:91)
        ckpt_dir=cfg.get("ckpt_path") or os.path.join(out_dir, "checkpoints"),
        limit_train_batches=tc.get("limit_train_batches"),
        limit_eval_batches=tc.get("limit_eval_batches"),
        cached_eval=tc.get("cached_eval", True),
        row_shard_embeddings=tc.get("row_shard_embeddings", True),
        # trainer.tp_transformer=true: PLM tower tensor-parallel over the
        # mesh's model axis (parallel/mesh.py; needs trainer.model_axis > 1)
        tp_transformer=tc.get("tp_transformer", False),
        compute_dtype=_normalize_precision(tc.get("precision")),
        overfit_batches=tc.get("overfit_batches"),
    )

    if adversarial:
        # SentiDebias: alternating two-optimizer training
        import jax as _jax

        from newsreclib_tpu.models.factory import build_senti_debias
        from newsreclib_tpu.models.fair_rec import create_sentidebias_state
        from newsreclib_tpu.training.adversarial import AdversarialTrainer

        gen, disc = build_senti_debias(cfg["model"], info)
        example = next(iter(train_batcher.epoch(0)))
        opt_cfg = cfg["model"].get("optimizer", {})
        sd_state = create_sentidebias_state(
            gen, disc, example, _jax.random.key(cfg.get("seed", 0)),
            g_lr=opt_cfg.get("lr", 1e-5), d_lr=opt_cfg.get("d_lr", 2e-5),
        )
        if cfg["model"].get("use_plm"):
            from newsreclib_tpu.models.factory import (
                splice_plm_params,
                take_pending_plm_params,
            )

            ported = take_pending_plm_params()
            if ported is not None:
                n = splice_plm_params(sd_state.g.params, ported)
                log.info("spliced ported PLM weights into %d generator towers", n)
        trainer = AdversarialTrainer(
            sd_state, build_loss(cfg["model"]), trainer_cfg,
            alpha=cfg["model"].get("alpha_coefficient", 0.15),
            beta=cfg["model"].get("beta_coefficient", 10.0),
            ranking=ranking, loggers=loggers, mesh=mesh,
        )
        metrics = trainer.fit(train_batcher, val_batcher,
                              resume=bool(cfg.get("ckpt_path")))
        if cfg.get("test_after_train", True):
            metrics.update(trainer.test(test_batcher))
        log.info("final metrics: %s", {k: round(v, 4) for k, v in metrics.items()})
        return metrics

    if global_rows:
        # model.init needs a densified example (news table present); build
        # one from a host-dedup batcher over the same impressions
        example = next(iter(TrainBatcher(
            store_train, train_imp, seed=cfg.get("seed", 0), **batcher_kwargs
        ).epoch(0)))
    else:
        example = next(iter(train_batcher.epoch(0)))
    state = create_train_state(
        model,
        example,
        jax.random.key(cfg.get("seed", 0)),
        build_optimizer(cfg, steps_per_epoch=len(train_batcher)),
        # "rbg" = TPU hardware RNG for dropout masks (36% of the PLM step
        # is threefry bit generation; benchmarks/plm_mfu_probe.py r5)
        dropout_rng_impl=tc.get("dropout_rng_impl"),
    )
    n_params = param_count(state.params)
    log.info("params: %d", n_params)
    for lg in loggers:
        if hasattr(lg, "log_hparams"):
            lg.log_hparams({"param_count": n_params, "cfg": cfg})

    if cfg["model"].get("use_plm"):
        from newsreclib_tpu.models.factory import splice_plm_params, take_pending_plm_params

        ported = take_pending_plm_params()
        if ported is not None:
            n = splice_plm_params(state.params, ported)
            log.info("spliced ported PLM weights into %d encoder towers", n)

    trainer = Trainer(state, loss_fn, trainer_cfg, ranking=ranking, loggers=loggers,
                      mesh=mesh, model=model, corpus=corpus_feats, u_bucket=u_bucket)

    metrics = trainer.fit(train_batcher, val_batcher,
                          resume=bool(cfg.get("ckpt_path")))
    if cfg.get("test_after_train", True):
        metrics.update(trainer.test(test_batcher))

    if cfg.get("save_recs") and hasattr(model, "encode_news"):
        # per-user recommendation export (abstract_recommender.py:159-193)
        from newsreclib_tpu.serving import CachedScorer

        recs_fpath = cfg.get("recs_fpath") or os.path.join(out_dir, "recommendations.json")
        CachedScorer(model, mesh=mesh,
                     compute_dtype=trainer_cfg.compute_dtype).export_recommendations(
            trainer.state.params, mind.news_store("test"), mind.impressions("test"),
            recs_fpath, max_history_len=dc["max_history_len"],
        )
        log.info("recommendations exported to %s", recs_fpath)

    log.info("final metrics: %s", {k: round(v, 4) for k, v in metrics.items()})
    return metrics


def task_wrapper(fn, cfg: dict):
    """Reference ``utils/utils.py:45-98`` analog: log the exception (with
    traceback) to ``<output_dir>/error.log``, always print the output dir,
    re-raise — so sweeps/multiruns survive and diagnose failed trials."""
    try:
        return fn(cfg)
    except Exception:
        import traceback

        out_dir = cfg.get("output_dir", ".")
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "error.log"), "a") as f:
            traceback.print_exc(file=f)
        log.exception("task failed; traceback saved to %s/error.log", out_dir)
        raise
    finally:
        log.info("output dir: %s", cfg.get("output_dir"))


def main() -> None:
    cfg = compose(
        os.path.join(REPO_ROOT, "newsreclib_tpu", "configs"), "train", sys.argv[1:]
    )
    task_wrapper(run, cfg)


if __name__ == "__main__":
    main()
