"""Vectorized random-forest inference (gather-based, fixed depth).

TPU-native replacement for the reference's onnxruntime TreeEnsembleClassifier
session (reference bicipital_groove.py:174-181).  Parameters are extracted
offline from the shipped ONNX by tools/extract_onnx_rf.py into dense
(tree, node) arrays; evaluation walks all trees for all samples in lockstep
for `max_depth` steps — pure gathers, no branching, vmappable and shardable.

The ONNX export (skl2onnx of an sklearn RandomForestClassifier) stores each
leaf's class distribution scaled by 1/n_trees with post_transform NONE, so
summing leaf weights over trees reproduces predict_proba exactly.
"""

from __future__ import annotations

import dataclasses
import importlib.resources
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ForestParams:
    feature: jnp.ndarray       # (T, M) int32
    value: jnp.ndarray         # (T, M) f32 thresholds
    true_child: jnp.ndarray    # (T, M) int32 (self at leaves)
    false_child: jnp.ndarray   # (T, M) int32
    leaf_weights: jnp.ndarray  # (T, M, C) f32
    max_depth: int             # static
    binary_complement: bool = False  # static: class-0 prob = 1 - class-1 sum

    def tree_flatten(self):
        return (
            (self.feature, self.value, self.true_child, self.false_child,
             self.leaf_weights),
            (self.max_depth, self.binary_complement),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, max_depth=aux[0], binary_complement=aux[1])


def load_params(npz_path=None) -> ForestParams:
    if npz_path is None:
        npz_path = (
            importlib.resources.files("shoulder_tpu")
            / "models/params/rfc_bg3.npz"
        )
    with np.load(npz_path) as z:
        return ForestParams(
            feature=jnp.asarray(z["feature"]),
            value=jnp.asarray(z["value"]),
            true_child=jnp.asarray(z["true_child"]),
            false_child=jnp.asarray(z["false_child"]),
            leaf_weights=jnp.asarray(z["leaf_weights"]),
            max_depth=int(z["max_depth"]),
            binary_complement=bool(z.get("binary_complement", False)),
        )


@partial(jax.jit, static_argnames=())
def predict_proba(params: ForestParams, x):
    """Class probabilities for samples x (R, n_features) -> (R, C).

    Matches ONNX TreeEnsembleClassifier semantics with BRANCH_LEQ nodes:
    go to the true child when x[feature] <= value.

    The lockstep descent is latency-bound (max_depth sequential rounds of
    (R, T) gathers), so each round is collapsed to ONE gather: node
    (feature, threshold, children) are packed into a single (T, M, 4)
    float table — small-int fields are exact in f32 — and the sample value
    is selected by a gather-free one-hot contraction over the 9 features.
    The round count is the forest's true max depth; the loop is unrolled
    (25 iterations of small ops — loop-carry overhead was comparable to
    the gathers themselves).
    """
    x = jnp.asarray(x)
    n_trees, _max_nodes = params.feature.shape
    n_features = x.shape[1]

    packed = jnp.stack(
        [
            params.feature.astype(jnp.float32),
            params.value,
            params.true_child.astype(jnp.float32),
            params.false_child.astype(jnp.float32),
        ],
        axis=-1,
    )  # (T, M, 4)
    fids = jnp.arange(n_features, dtype=jnp.float32)

    idx = jnp.zeros((x.shape[0], n_trees), dtype=jnp.int32)
    for _ in range(params.max_depth):
        g = jnp.take_along_axis(
            packed[None], idx[..., None, None], axis=2
        )[:, :, 0, :]                                   # (R, T, 4)
        onehot = g[..., 0:1] == fids                    # (R, T, F), no gather
        xv = jnp.sum(jnp.where(onehot, x[:, None, :], 0.0), axis=-1)
        go_true = xv <= g[..., 1]
        idx = jnp.where(go_true, g[..., 2], g[..., 3]).astype(jnp.int32)

    # gather leaf class weights and sum over trees
    lw = jnp.take_along_axis(
        params.leaf_weights[None], idx[..., None, None], axis=2
    )[:, :, 0, :]  # (R, T, C)
    proba = jnp.sum(lw, axis=1)
    if params.binary_complement:
        proba = proba.at[:, 0].set(1.0 - proba[:, 1])
    return proba
