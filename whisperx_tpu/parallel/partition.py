"""Parameter partition rules: path-pattern → PartitionSpec.

Tensor-parallel layout for the transformer stacks (the whisper-jax /
t5x-style logical mapping, SNIPPETS.md[3]):

- attention q/k/v kernels shard the *head* (output) dim on "model";
  the out-projection shards its input dim, so the block's collective is a
  single psum at the residual add (emitted automatically by pjit);
- MLP fc1 shards the hidden (4d) output dim, fc2 the matching input dim;
- embeddings shard the vocab dim (logits top-k all-gathers over ICI);
- LayerNorms, convs, and biases of row-sharded matmuls stay replicated.

Rules are matched on the flattened "a/b/c" parameter path with fnmatch
wildcards; first match wins. The same tree-spec machinery serves Whisper,
wav2vec2, and the VAD/speaker models.
"""

from __future__ import annotations

import fnmatch
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (pattern, spec) — first match wins. Patterns cover both encoder and decoder
# stacks of the Whisper tree and the wav2vec2 encoder tree.
WHISPER_RULES: tuple[tuple[str, P], ...] = (
    # Attention projections: column-parallel qkv, row-parallel out.
    ("*/attn/query/kernel", P(None, "model")),
    ("*/attn/key/kernel", P(None, "model")),
    ("*/attn/value/kernel", P(None, "model")),
    ("*/attn/out/kernel", P("model", None)),
    ("*/cross_attn/query/kernel", P(None, "model")),
    ("*/cross_attn/key/kernel", P(None, "model")),
    ("*/cross_attn/value/kernel", P(None, "model")),
    ("*/cross_attn/out/kernel", P("model", None)),
    ("*/attn/query/bias", P("model")),
    ("*/attn/value/bias", P("model")),
    ("*/cross_attn/query/bias", P("model")),
    ("*/cross_attn/value/bias", P("model")),
    # MLP: column-parallel fc1, row-parallel fc2.
    ("*/mlp/fc1/kernel", P(None, "model")),
    ("*/mlp/fc1/bias", P("model")),
    ("*/mlp/fc2/kernel", P("model", None)),
    # int8 weight-only scales follow their kernel's output-dim sharding:
    # column-parallel kernels shard the (out,) scale, row-parallel replicate.
    ("*/attn/query/kernel_scale", P("model")),
    ("*/attn/key/kernel_scale", P("model")),
    ("*/attn/value/kernel_scale", P("model")),
    ("*/cross_attn/query/kernel_scale", P("model")),
    ("*/cross_attn/key/kernel_scale", P("model")),
    ("*/cross_attn/value/kernel_scale", P("model")),
    ("*/mlp/fc1/kernel_scale", P("model")),
    # Embeddings: shard the vocab/feature table rows (and per-row scales).
    ("*token_embedding", P("model", None)),
    ("*token_embedding_scale", P("model")),
    # Everything else (LayerNorm scales, conv kernels, out/fc2 biases,
    # positional embeddings) is replicated.
)

W2V2_RULES: tuple[tuple[str, P], ...] = (
    # out_proj first: the generic *_proj pattern below would otherwise match
    # it (first rule wins) and give the row-parallel matmul a column spec.
    ("*/attention/out_proj/kernel", P("model", None)),
    ("*/attention/*_proj/kernel", P(None, "model")),
    ("*/feed_forward/intermediate/kernel", P(None, "model")),
    ("*/feed_forward/intermediate/bias", P("model")),
    ("*/feed_forward/output/kernel", P("model", None)),
    ("*lm_head/kernel", P(None, None)),
)


def _spec_for(path: str, rules) -> P:
    for pattern, spec in rules:
        if fnmatch.fnmatch(path, pattern):
            return spec
    return P()


def partition_specs(params: Any, rules=WHISPER_RULES):
    """PartitionSpec pytree matching `params`, derived from path rules."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        return "/".join(parts)

    specs = {path_str(kp): _spec_for(path_str(kp), rules) for kp, _ in flat}
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [specs[path_str(kp)] for kp, _ in flat]
    )


def shard_params(params, mesh: Mesh, rules=WHISPER_RULES):
    """Place a parameter tree on the mesh according to the rules.

    Dims that do not divide the mesh axis fall back to replication for that
    param (keeps tiny test models and odd head counts working on any mesh).
    """
    specs = partition_specs(params, rules)

    def place(x, spec):
        ax_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = ax_sizes.get(axis, 1)
            if dim >= x.ndim or x.shape[dim] % size != 0:
                ok = False
        target = spec if ok else P()
        return jax.device_put(x, NamedSharding(mesh, target))

    return jax.tree_util.tree_map(place, params, specs)
