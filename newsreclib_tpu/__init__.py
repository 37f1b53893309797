"""newsreclib_tpu — a TPU-native neural news recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of NewsRecLib
(andreeaiana/newsreclib): news/user encoders, click prediction, CE/SupCon
losses, ranking + beyond-accuracy metrics, MIND/Adressa/xMIND data pipelines —
built for TPU: static shapes, batched MXU-friendly compute, SPMD via
`jax.sharding.Mesh` + jit, Pallas kernels for the hot ops.

Design differences vs the reference (see SURVEY.md §7):
  * Functional core: models are flax.linen modules applied inside a single
    jitted `train_step` / `eval_step`; no Lightning analogue.
  * Static shapes: ragged impression batches (reference
    `rec_dataset.py:289-293` + `to_dense_batch`) are replaced by padded /
    bucketed batches with masks, and news are deduplicated across the batch so
    each unique article is encoded exactly once per step.
  * Sharding: data parallel mesh via `jax.sharding`; embedding tables can be
    row-sharded across hosts.
"""

__version__ = "0.1.0"
