"""Model factory: config dict + dataset info → flax model + loss fn.

Reference analog: Hydra ``_target_`` instantiation of the per-model
Lightning modules (``train.py:61``).  Dataset-derived sizes (vocab, user,
class counts) and pretrained matrices are injected here rather than wired
through config interpolation.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import numpy as np

from newsreclib_tpu.models import general_rec
from newsreclib_tpu.models.components.losses import get_loss_fn


@dataclass
class DataInfo:
    vocab_size: int
    num_users: int = 1
    num_categories: int = 19
    num_subcategories: int = 1
    num_sent_classes: int = 4
    entity_vocab_size: int = 1
    pretrained_embeddings: Optional[np.ndarray] = None
    pretrained_entity_embeddings: Optional[np.ndarray] = None
    pretrained_categ_embeddings: Optional[np.ndarray] = None


def _common(cfg: Dict, info: DataInfo) -> Dict[str, Any]:
    return {
        "vocab_size": info.vocab_size,
        "late_fusion": cfg.get("late_fusion", False),
        "pretrained_embeddings": info.pretrained_embeddings,
    }


def _build_plm_tower(cfg: Dict):
    """PLM text tower (reference use_plm path): port HF torch weights into
    the from-scratch transformer; falls back to random init (with a loud
    warning) when weights are unavailable (offline)."""
    import logging

    from newsreclib_tpu.models.components.plm import (
        PLMTextEncoder,
        TransformerEncoder,
        load_hf_torch_weights,
    )

    log = logging.getLogger("newsreclib_tpu")
    plm_name = cfg.get("plm_model", "roberta-base")
    params = None
    try:
        params, kwargs = load_hf_torch_weights(plm_name)
    except Exception as e:  # noqa: BLE001 — offline: weights not fetchable
        log.warning(
            "PLM weights for %r unavailable (%s); using RANDOM initialization "
            "— fine for pipeline tests, useless for accuracy", plm_name, e,
        )
        kwargs = dict(
            vocab_size=cfg.get("plm_vocab_size", 50265),
            hidden_dim=cfg.get("embed_dim", 768),
            num_layers=cfg.get("plm_num_layers", 12),
            num_heads=cfg.get("plm_num_heads", 12),
            intermediate_dim=4 * cfg.get("embed_dim", 768),
            max_position=cfg.get("plm_max_position", 512),
        )
    encoder = TransformerEncoder(**kwargs)
    tower = PLMTextEncoder(
        encoder=encoder,
        use_mhsa=cfg.get("plm_use_mhsa", True),
        num_heads=cfg.get("num_heads", 16),
        query_dim=cfg.get("query_dim", 200),
        apply_reduce_dim=cfg.get("apply_reduce_dim", False),
        reduced_embed_dim=cfg.get("news_embed_dim"),
        dropout=cfg.get("dropout_probability", 0.2),
        # segment-ID packing of the length-split short segments (round 5;
        # measured on the v5e by benchmarks/plm_mfu_probe.py — see
        # docs/architecture.md PLM MFU table)
        pack_to=cfg.get("plm_pack_titles", 128),
    )
    tower_dim = (
        cfg.get("news_embed_dim")
        if cfg.get("apply_reduce_dim", False)
        else kwargs["hidden_dim"]
    )
    return tower, params, tower_dim


_pending_plm_params = None


def take_pending_plm_params():
    """Ported HF weights from the last ``build_model(use_plm=True)`` call;
    splice into an initialized train state with ``splice_plm_params``."""
    global _pending_plm_params
    p, _pending_plm_params = _pending_plm_params, None
    return p


def splice_plm_params(params, ported):
    """Replace every transformer-encoder subtree (identified by its
    ``word_embeddings`` child) with the ported HF weights, in place."""
    replaced = 0

    def walk(node):
        nonlocal replaced
        if not isinstance(node, dict):
            return
        for key, child in node.items():
            if (
                isinstance(child, dict)
                and key == "encoder"
                and "word_embeddings" in child
            ):
                node[key] = ported
                replaced += 1
            else:
                walk(child)

    walk(params)
    return replaced


def title_split_margin(model_name: str, model_cfg: Optional[Dict] = None) -> int:
    """Title headroom the model needs for exact length-trim/split batching
    (``data/batching.py::split_news_by_length``): DKN's KCNN max-pools over
    VALID-conv windows that straddle/exceed the title, everything else is
    masked-attention / SAME-conv and exact at 0.  Derived from the config's
    ``window_sizes`` (ADVICE r3: a fixed constant went stale the moment a
    config overrode the windows)."""
    if model_name != "dkn":
        return 0
    return int(max((model_cfg or {}).get("window_sizes", (1, 2, 3, 4))))


def build_model(cfg: Dict, info: DataInfo):
    """cfg: the ``model`` config node (must carry ``name``)."""
    global _pending_plm_params
    name = cfg["name"]
    d = cfg.get("dropout_probability", 0.2)
    plm_tower, plm_dim = None, None
    if cfg.get("use_plm"):
        plm_tower, _pending_plm_params, plm_dim = _build_plm_tower(cfg)
    plm_kwargs = (
        {"text_encoder_module": plm_tower, "text_encoder_dim": plm_dim}
        if plm_tower is not None
        else {}
    )

    if name == "nrms":
        return general_rec.NRMS(
            **_common(cfg, info),
            embed_dim=cfg.get("embed_dim", 300),
            num_heads=cfg.get("num_heads", 15),
            query_dim=cfg.get("query_dim", 200),
            dropout=d,
            text_encoder_module=plm_tower,
            pack_titles=cfg.get("pack_titles", 128),
        )
    if name == "naml":
        return general_rec.NAML(
            **_common(cfg, info),
            **plm_kwargs,
            num_categories=info.num_categories,
            attributes2encode=tuple(cfg.get("attributes2encode", ("title", "abstract", "category"))),
            text_embed_dim=cfg.get("text_embed_dim", 300),
            categ_embed_dim=cfg.get("categ_embed_dim", 100),
            num_filters=cfg.get("num_filters", 400),
            window_size=cfg.get("window_size", 3),
            query_dim=cfg.get("query_dim", 200),
            dropout=d,
        )
    if name == "lstur":
        return general_rec.LSTUR(
            **_common(cfg, info),
            **plm_kwargs,
            num_users=info.num_users,
            num_categories=info.num_categories,
            attributes2encode=tuple(cfg.get("attributes2encode", ("title", "abstract", "category"))),
            text_embed_dim=cfg.get("text_embed_dim", 300),
            categ_embed_dim=cfg.get("categ_embed_dim", 100),
            num_filters=cfg.get("num_filters", 300),
            window_size=cfg.get("window_size", 3),
            query_dim=cfg.get("query_dim", 200),
            dropout=d,
            user_masking_probability=cfg.get("user_masking_probability", 0.5),
            long_short_term_method=cfg.get("long_short_term_method", "ini"),
        )
    if name == "npa":
        return general_rec.NPA(
            vocab_size=info.vocab_size,
            late_fusion=cfg.get("late_fusion", False),
            pretrained_embeddings=info.pretrained_embeddings,
            num_users=info.num_users,
            text_embed_dim=cfg.get("text_embed_dim", 300),
            user_embed_dim=cfg.get("user_embed_dim", 50),
            num_filters=cfg.get("num_filters", 400),
            window_size=cfg.get("window_size", 3),
            word_pref_query_dim=cfg.get("word_pref_query_dim", 200),
            news_pref_query_dim=cfg.get("news_pref_query_dim", 200),
            dropout=d,
        )
    if name == "tanr":
        return general_rec.TANR(
            **_common(cfg, info),
            **plm_kwargs,
            num_categories=info.num_categories,
            embed_dim=cfg.get("embed_dim", 300),
            num_heads=cfg.get("num_heads", 15),
            num_filters=cfg.get("num_filters", 400),
            window_size=cfg.get("window_size", 3),
            query_dim=cfg.get("query_dim", 200),
            dropout=d,
            topic_pred_loss_coef=cfg.get("topic_pred_loss_coef", 0.2),
        )
    if name == "caum":
        return general_rec.CAUM(
            pack_titles=cfg.get("pack_titles", 128),
            **_common(cfg, info),
            **plm_kwargs,
            entity_vocab_size=info.entity_vocab_size,
            num_categories=info.num_categories,
            attributes2encode=tuple(cfg.get("attributes2encode", ("title", "category", "title_entities"))),
            text_embed_dim=cfg.get("text_embed_dim", 300),
            text_num_heads=cfg.get("text_num_heads", 20),
            categ_embed_dim=cfg.get("categ_embed_dim", 100),
            news_embed_dim=cfg.get("news_embed_dim", 400),
            entity_embed_dim=cfg.get("entity_embed_dim", 100),
            query_dim=cfg.get("query_dim", 200),
            dropout=d,
            user_vector_dim=cfg.get("user_vector_dim", 400),
            num_filters=cfg.get("num_filters", 400),
            dense_att_hidden_dim1=cfg.get("dense_att_hidden_dim1", 400),
            dense_att_hidden_dim2=cfg.get("dense_att_hidden_dim2", 256),
            pretrained_entity_embeddings=info.pretrained_entity_embeddings,
        )
    if name == "mins":
        return general_rec.MINS(
            pack_titles=cfg.get("pack_titles", 128),
            **_common(cfg, info),
            **plm_kwargs,
            num_categories=info.num_categories,
            attributes2encode=tuple(cfg.get("attributes2encode", ("title", "abstract", "category"))),
            text_embed_dim=cfg.get("text_embed_dim", 300),
            categ_embed_dim=cfg.get("categ_embed_dim", 100),
            num_heads=cfg.get("num_heads", 15),
            query_dim=cfg.get("query_dim", 200),
            dropout=d,
            num_filters=cfg.get("num_filters"),
            num_gru_channels=cfg.get("num_gru_channels", 6),
        )
    if name == "cen_news_rec":
        return general_rec.CenNewsRec(
            **_common(cfg, info),
            **plm_kwargs,
            embed_dim=cfg.get("embed_dim", 300),
            num_heads=cfg.get("num_heads", 20),
            num_filters=cfg.get("num_filters", 400),
            window_size=cfg.get("window_size", 3),
            query_dim=cfg.get("query_dim", 200),
            dropout=d,
            # short/long-term vectors are stacked in the user encoder, so the
            # GRU hidden must match the news dim (the PLM tower's when use_plm)
            gru_hidden_dim=cfg.get("gru_hidden_dim", plm_dim or 400),
            num_recent_news=cfg.get("num_recent_news", 20),
        )
    if name == "dkn":
        return general_rec.DKN(
            vocab_size=info.vocab_size,
            late_fusion=cfg.get("late_fusion", False),
            pretrained_embeddings=info.pretrained_embeddings,
            entity_vocab_size=info.entity_vocab_size,
            text_embed_dim=cfg.get("text_embed_dim", 300),
            entity_embed_dim=cfg.get("entity_embed_dim", 100),
            num_filters=cfg.get("num_filters", 100),
            window_sizes=tuple(cfg.get("window_sizes", (1, 2, 3, 4))),
            use_context=cfg.get("use_context", True),
            use_entities=cfg.get("use_entities", True),
            hidden_dim_dnn=cfg.get("hidden_dim_dnn", 16),
            pretrained_entity_embeddings=info.pretrained_entity_embeddings,
        )
    if name == "miner":
        return general_rec.MINER(
            pack_titles=cfg.get("pack_titles", 128),
            **_common(cfg, info),
            text_encoder_module=plm_tower,
            num_categories=info.num_categories,
            text_embed_dim=cfg.get("text_embed_dim", 300),
            news_embed_dim=cfg.get("news_embed_dim", 256),
            num_heads=cfg.get("num_heads", 15),
            query_dim=cfg.get("query_dim", 200),
            dropout=d,
            use_categ_bias=cfg.get("use_categ_bias", True),
            categ_embed_dim=cfg.get("categ_embed_dim", 100),
            num_context_codes=cfg.get("num_context_codes", 32),
            context_code_dim=cfg.get("context_code_dim", 200),
            score_type=cfg.get("score_type", "weighted"),
            pretrained_categ_embeddings=info.pretrained_categ_embeddings,
        )
    if name == "sentirec":
        from newsreclib_tpu.models import fair_rec

        return fair_rec.SentiRec(
            pack_titles=cfg.get("pack_titles", 128),
            **_common(cfg, info),
            **plm_kwargs,
            embed_dim=cfg.get("embed_dim", 300),
            num_heads=cfg.get("num_heads", 15),
            query_dim=cfg.get("query_dim", 200),
            dropout=d,
            sent_pred_loss_coef=cfg.get("sent_pred_loss_coef", 0.4),
            sent_div_loss_coef=cfg.get("sent_div_loss_coef", 10.0),
        )
    if name == "manner_cr":
        from newsreclib_tpu.models import fair_rec

        return fair_rec.MANNeRCR(
            text_encoder_module=plm_tower,
            vocab_size=info.vocab_size,
            entity_vocab_size=info.entity_vocab_size,
            use_entities=cfg.get("use_entities", True),
            text_embed_dim=cfg.get("text_embed_dim", 300),
            entity_embed_dim=cfg.get("entity_embed_dim", 100),
            num_heads=cfg.get("num_heads", 15),
            query_dim=cfg.get("query_dim", 200),
            dropout=d,
            late_fusion=cfg.get("late_fusion", True),
            remat=cfg.get("remat", False),
            pretrained_embeddings=info.pretrained_embeddings,
            pretrained_entity_embeddings=info.pretrained_entity_embeddings,
        )
    raise ValueError(f"unknown model: {name}")


def build_manner_a(cfg: Dict, info: DataInfo):
    """MANNeR A-module (aspect-specialized embedding space; reference
    ``fair_rec/manner_a_module.py`` + ``configs/model/manner_a_module.yaml``).
    Trained by ``training/aspect.py::run_aspect_training`` (SupCon on
    m-per-class news batches), not the slate path."""
    global _pending_plm_params
    from newsreclib_tpu.models import fair_rec

    plm_tower = None
    if cfg.get("use_plm"):
        plm_tower, _pending_plm_params, _ = _build_plm_tower(cfg)
    return fair_rec.MANNeRA(
        text_encoder_module=plm_tower,
        vocab_size=info.vocab_size,
        entity_vocab_size=info.entity_vocab_size,
        use_entities=cfg.get("use_entities", True),
        text_embed_dim=cfg.get("text_embed_dim", 300),
        entity_embed_dim=cfg.get("entity_embed_dim", 100),
        num_heads=cfg.get("num_heads", 15),
        query_dim=cfg.get("query_dim", 200),
        dropout=cfg.get("dropout_probability", 0.2),
        pretrained_embeddings=info.pretrained_embeddings,
        pretrained_entity_embeddings=info.pretrained_entity_embeddings,
    )


def build_senti_debias(cfg: Dict, info: DataInfo):
    """SentiDebias generator+discriminator pair (adversarial training path,
    see training/adversarial.py)."""
    global _pending_plm_params
    from newsreclib_tpu.models import fair_rec

    plm_kwargs = {}
    if cfg.get("use_plm"):
        plm_tower, _pending_plm_params, plm_dim = _build_plm_tower(cfg)
        plm_kwargs = {"text_encoder_module": plm_tower, "text_encoder_dim": plm_dim}
    gen = fair_rec.SentiDebiasGenerator(
        pack_titles=cfg.get("pack_titles", 128),
        **plm_kwargs,
        vocab_size=info.vocab_size,
        num_sent_classes=info.num_sent_classes - 1,
        embed_dim=cfg.get("embed_dim", 300),
        num_heads=cfg.get("num_heads", 15),
        query_dim=cfg.get("query_dim", 200),
        sent_embed_dim=cfg.get("sent_embed_dim", 64),
        dropout=cfg.get("dropout_probability", 0.2),
        late_fusion=cfg.get("late_fusion", False),
        pretrained_embeddings=info.pretrained_embeddings,
    )
    disc = fair_rec.SentiDebiasDiscriminator(
        hidden_dim=cfg.get("discriminator_hidden_dim", 128),
        num_sent_classes=info.num_sent_classes - 1,
    )
    return gen, disc


def build_loss(cfg: Dict) -> Callable:
    return get_loss_fn(
        cfg.get("loss", "cross_entropy_loss"),
        temperature=cfg.get("temperature") or 0.1,
        dual_loss_coef=cfg.get("dual_loss_coef") or 0.5,
    )


def load_data_info(mind_data, cfg_model: Dict) -> DataInfo:
    """Build DataInfo from a MINDData instance + model config."""
    classes = mind_data.num_classes()
    use_pretrained_w = cfg_model.get("use_pretrained_embeddings", True)
    # xMIND extends the train vocab + matrix with target-language words from
    # an aligned embedding file (data/xmind.py::ensure_word_embeddings)
    emb_dir = (
        mind_data.ensure_word_embeddings()
        if use_pretrained_w and hasattr(mind_data, "ensure_word_embeddings")
        else None
    ) or mind_data.split_dir("train")
    emb_path = os.path.join(emb_dir, "transformed_word_embeddings.npy")
    ent_path = os.path.join(
        mind_data.split_dir("train"), "transformed_entity_embeddings.npy"
    )
    categ_path = os.path.join(
        mind_data.split_dir("train"), "transformed_categ_embeddings.npy"
    )
    return DataInfo(
        vocab_size=mind_data.vocab_size(),
        num_users=mind_data.num_users(),
        num_categories=classes["category"],
        num_subcategories=classes["subcategory"],
        num_sent_classes=classes["sentiment"],
        entity_vocab_size=classes["entity"],
        pretrained_embeddings=(
            np.load(emb_path) if use_pretrained_w and os.path.exists(emb_path) else None
        ),
        pretrained_entity_embeddings=(
            np.load(ent_path) if os.path.exists(ent_path) else None
        ),
        pretrained_categ_embeddings=(
            np.load(categ_path) if os.path.exists(categ_path) else None
        ),
    )
