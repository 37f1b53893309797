"""Offline MLM pretraining of a small PLM tower on the statfix corpus
(VERDICT r4 task 5).

No real HF weights are reachable in this environment, so this script
produces a GENUINELY pretrained initialization the offline way: masked-
language-model pretraining of a 4-layer BERT-shaped TransformerEncoder on
the statfix titles (+abstracts), saved as a HF-format torch checkpoint
(``save_as_hf_bert``).  Fine-tuning then flows through the REAL porting +
layer-freezing path (``load_hf_torch_weights``; reference ``text.py:67-73``)
via configs ``nrms_statfix_plm4_pre`` / ``nrms_statfix_plm4_rand``:

  python benchmarks/mlm_pretrain.py                 # pretrain + export
  python train.py experiment=nrms_statfix_plm4_pre  # fine-tune (ported)
  python train.py experiment=nrms_statfix_plm4_rand # control (random init)
  python benchmarks/plm_frozen_check.py <run_dir>   # frozen layers intact?

Done-criterion: fine-tuned AUC beats random-init beyond the measured seed
band (outputs/seed_band.jsonl) and frozen layers are verifiably unchanged.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

HIDDEN, LAYERS, HEADS, INTER = 256, 4, 8, 1024
SEQ_LEN = 48  # title (<=30) + abstract head


def build_corpus(data_dir: str):
    from newsreclib_tpu.data.mind import MINDConfig, MINDData

    mind = MINDData(MINDConfig(
        data_dir=data_dir, dataset_size="small",
        valid_time_split="2019-11-14 00:00:00",
        sentiment_annotator="lexicon", seed=42,
    ))
    store = mind.news_store("train")
    title = np.asarray(store.title)  # (N, 30)
    if store.abstract is not None:
        abstract = np.asarray(store.abstract)[:, : SEQ_LEN]
    else:
        abstract = np.zeros((title.shape[0], 0), np.int32)
    seqs = np.zeros((title.shape[0], SEQ_LEN), np.int32)
    for i in range(title.shape[0]):
        toks = np.concatenate([title[i][title[i] != 0], abstract[i][abstract[i] != 0]])
        seqs[i, : min(len(toks), SEQ_LEN)] = toks[:SEQ_LEN]
    seqs = seqs[1:]  # drop the padding article row
    return seqs, mind.vocab_size()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="data/statfix")
    ap.add_argument("--out", default="data/statfix/plm4_pretrained")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from train import _setup_compile_cache

    _setup_compile_cache()
    from newsreclib_tpu.models.components.plm import TransformerEncoder, save_as_hf_bert

    seqs, vocab = build_corpus(args.data_dir)
    mask_id = vocab + 1
    model_vocab = vocab + 2
    print(f"corpus: {seqs.shape[0]} articles, vocab {vocab} (+mask id {mask_id})")

    import flax.linen as nn

    class MLMModel(nn.Module):
        @nn.compact
        def __call__(self, tokens, deterministic=True):
            enc = TransformerEncoder(
                vocab_size=model_vocab, hidden_dim=HIDDEN, num_layers=LAYERS,
                num_heads=HEADS, intermediate_dim=INTER, max_position=64,
                name="encoder",
            )
            h = enc(tokens, tokens != 0, deterministic)
            h = nn.Dense(HIDDEN, name="mlm_dense")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.LayerNorm(epsilon=1e-12, name="mlm_ln")(h)
            return nn.Dense(model_vocab, name="mlm_out")(h)

    model = MLMModel()
    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)
    example = jnp.asarray(seqs[: args.batch])
    params = model.init({"params": key, "dropout": key}, example)["params"]
    tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, args.lr, min(500, args.steps // 10), args.steps))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, tokens, targets, mlm_mask, key):
        def loss_fn(p):
            logits = model.apply({"params": p}, tokens, deterministic=False,
                                 rngs={"dropout": key})
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
            m = mlm_mask.astype(jnp.float32)
            acc = (jnp.argmax(logits, -1) == targets) * m
            return (nll * m).sum() / jnp.maximum(m.sum(), 1.0), acc.sum() / jnp.maximum(m.sum(), 1.0)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    t0 = time.time()
    for it in range(args.steps):
        idx = rng.integers(0, seqs.shape[0], size=args.batch)
        tok = seqs[idx].copy()
        valid = tok != 0
        prob = rng.random(tok.shape)
        mlm_mask = (prob < 0.15) & valid
        targets = seqs[idx]
        r = rng.random(tok.shape)
        tok = np.where(mlm_mask & (r < 0.8), mask_id, tok)           # [MASK]
        rand_tok = rng.integers(1, vocab + 1, size=tok.shape)
        tok = np.where(mlm_mask & (r >= 0.8) & (r < 0.9), rand_tok, tok)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(tok), jnp.asarray(targets),
            jnp.asarray(mlm_mask), jax.random.fold_in(key, it),
        )
        if it % 200 == 0 or it == args.steps - 1:
            print(f"step {it}: mlm_loss={float(loss):.4f} "
                  f"masked_acc={float(acc):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    enc_kwargs = dict(
        vocab_size=model_vocab, hidden_dim=HIDDEN, num_layers=LAYERS,
        num_heads=HEADS, intermediate_dim=INTER, max_position=64,
    )
    out = save_as_hf_bert(jax.device_get(params["encoder"]), enc_kwargs,
                          os.path.join(REPO, args.out))
    print(f"exported HF-format checkpoint to {out} "
          f"(final mlm_loss {float(loss):.4f}, masked_acc {float(acc):.4f})")


if __name__ == "__main__":
    main()
