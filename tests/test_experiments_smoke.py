"""Every experiment config must compose cleanly and build its model via the
factory (VERDICT r1 item 8 'done' criterion).  Model construction is lazy in
flax (no params until init), so this is fast even for the PLM variants —
offline PLM weights fall back to random init with a warning."""

import glob
import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from newsreclib_tpu.config.compose import compose
from newsreclib_tpu.models.factory import (
    DataInfo,
    build_loss,
    build_manner_a,
    build_model,
    build_senti_debias,
)

CONFIG_DIR = os.path.join(REPO_ROOT, "newsreclib_tpu", "configs")
EXPERIMENTS = sorted(
    os.path.basename(p)[:-5]
    for p in glob.glob(os.path.join(CONFIG_DIR, "experiment", "*.yaml"))
)

INFO = DataInfo(vocab_size=120, num_users=40, num_categories=10,
                num_subcategories=12, num_sent_classes=4, entity_vocab_size=30)


def test_experiment_count_covers_reference():
    # the reference ships 63 experiment configs; ours must cover all of them
    ref_dir = "/root/reference/configs/experiment"
    if os.path.isdir(ref_dir):
        ref_names = {f[:-5] for f in os.listdir(ref_dir) if f.endswith(".yaml")}
        ours = set(EXPERIMENTS)
        missing = sorted(ref_names - ours)
        assert not missing, f"missing reference experiments: {missing}"


@pytest.mark.parametrize("name", EXPERIMENTS)
def test_experiment_composes_and_builds(name):
    cfg = compose(CONFIG_DIR, "train", [f"experiment={name}"])
    assert "model" in cfg and "data" in cfg and "trainer" in cfg
    mc = dict(cfg["model"])
    # PLM weight download is impossible offline; factory warns + random-inits
    model_name = mc["name"]
    if model_name == "manner":
        build_model(mc["cr"], INFO)
        for node in (mc.get("aspects") or {}).values():
            if node:
                build_manner_a(node, INFO)
        return
    if model_name == "manner_a":
        build_manner_a(mc, INFO)
        return
    if mc.get("adversarial") or model_name == "senti_debias":
        gen, disc = build_senti_debias(mc, INFO)
        assert gen is not None and disc is not None
        return
    model = build_model(mc, INFO)
    assert model is not None
    loss = build_loss(mc)
    assert callable(loss)
