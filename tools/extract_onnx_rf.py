"""Offline converter: ONNX TreeEnsembleClassifier -> dense .npz arrays.

The reference ships its bicipital-groove classifier as an ONNX random
forest (reference src/shoulder/humerus/models/rfc_bg3.onnx, consumed at
bicipital_groove.py:174-181).  SURVEY.md §2.2 notes the full parameters are
recoverable from the protobuf.  This tool parses the ONNX protobuf wire
format directly (no onnx/onnxruntime dependency) and emits the dense
(tree, node) arrays consumed by shoulder_tpu.models.forest.

Run:  python tools/extract_onnx_rf.py <model.onnx> <out.npz>
"""

from __future__ import annotations

import struct
import sys

import numpy as np

WT_VARINT, WT_I64, WT_LEN, WT_I32 = 0, 1, 2, 5


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf):
    """Yield (field_number, wire_type, value) for one protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == WT_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wt == WT_I64:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == WT_LEN:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == WT_I32:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def fields_dict(buf):
    out = {}
    for field, wt, val in iter_fields(buf):
        out.setdefault(field, []).append((wt, val))
    return out


def _zigzag_ok_int(v):
    # protobuf int64 varints are two's complement; convert if negative range
    return v - (1 << 64) if v >= (1 << 63) else v


def parse_attribute(buf):
    """AttributeProto -> (name, value)."""
    f = fields_dict(buf)
    name = f[1][0][1].decode()
    if 7 in f:  # repeated float, may be packed or repeated
        floats = []
        for wt, v in f[7]:
            if wt == WT_LEN:
                floats.extend(struct.unpack(f"<{len(v)//4}f", v))
            else:
                floats.append(struct.unpack("<f", v)[0])
        return name, np.asarray(floats, np.float32)
    if 8 in f:  # repeated int64
        ints = []
        for wt, v in f[8]:
            if wt == WT_LEN:
                pos = 0
                while pos < len(v):
                    x, pos = _read_varint(v, pos)
                    ints.append(_zigzag_ok_int(x))
            else:
                ints.append(_zigzag_ok_int(v))
        return name, np.asarray(ints, np.int64)
    if 9 in f:  # repeated bytes
        return name, [v.decode() for _, v in f[9]]
    if 4 in f:  # single bytes
        return name, f[4][0][1].decode()
    if 2 in f:  # single float
        return name, struct.unpack("<f", f[2][0][1])[0]
    if 3 in f:  # single int
        return name, _zigzag_ok_int(f[3][0][1])
    return name, None


def parse_tree_ensemble(path):
    """Extract the first TreeEnsembleClassifier node's attributes."""
    data = open(path, "rb").read()
    model = fields_dict(data)
    graph = fields_dict(model[7][0][1])       # ModelProto.graph
    for _, node_buf in graph.get(1, []):      # GraphProto.node
        node = fields_dict(node_buf)
        op_type = node.get(4, [(None, b"")])[0][1].decode()
        if op_type != "TreeEnsembleClassifier":
            continue
        attrs = {}
        for _, attr_buf in node.get(5, []):
            k, v = parse_attribute(attr_buf)
            attrs[k] = v
        return attrs
    raise ValueError("no TreeEnsembleClassifier node found")


def densify(attrs):
    """(tree, node) dense arrays for a gather-based JAX evaluator."""
    tree_ids = attrs["nodes_treeids"]
    node_ids = attrs["nodes_nodeids"]
    n_trees = int(tree_ids.max()) + 1
    max_nodes = int(node_ids.max()) + 1

    modes = attrs["nodes_modes"]
    is_leaf_src = np.array([m == "LEAF" for m in modes])
    branch_modes = {m for m in modes if m != "LEAF"}
    if not branch_modes <= {"BRANCH_LEQ"}:
        raise ValueError(f"unsupported branch modes: {branch_modes}")

    feature = np.zeros((n_trees, max_nodes), np.int32)
    value = np.zeros((n_trees, max_nodes), np.float32)
    true_child = np.zeros((n_trees, max_nodes), np.int32)
    false_child = np.zeros((n_trees, max_nodes), np.int32)
    is_leaf = np.ones((n_trees, max_nodes), bool)  # padding acts as leaf

    t, n = tree_ids.astype(int), node_ids.astype(int)
    feature[t, n] = attrs["nodes_featureids"]
    value[t, n] = attrs["nodes_values"]
    true_child[t, n] = attrs["nodes_truenodeids"]
    false_child[t, n] = attrs["nodes_falsenodeids"]
    is_leaf[t, n] = is_leaf_src
    # leaves point to themselves so the fixed-depth walk is a no-op there
    self_idx = np.broadcast_to(np.arange(max_nodes), (n_trees, max_nodes))
    true_child = np.where(is_leaf, self_idx, true_child).astype(np.int32)
    false_child = np.where(is_leaf, self_idx, false_child).astype(np.int32)

    classes = attrs["classlabels_int64s"]
    n_classes = len(classes)
    leaf_weights = np.zeros((n_trees, max_nodes, n_classes), np.float32)
    ct = attrs["class_treeids"].astype(int)
    cn = attrs["class_nodeids"].astype(int)
    cc = attrs["class_ids"].astype(int)
    # binary single-score export: one weight per leaf, all class_ids == 0.
    # ONNX ML convention (same as LinearClassifier): the aggregated score is
    # the positive-class probability, and the runtime emits [1 - s, s].
    binary_complement = bool(n_classes == 2 and set(cc.tolist()) == {0}
                             and len(cc) == int(is_leaf_src.sum()))
    if binary_complement:
        leaf_weights[ct, cn, 1] = attrs["class_weights"]
    else:
        leaf_weights[ct, cn, cc] = attrs["class_weights"]

    # tree depth for the fixed-depth traversal
    depth = np.zeros((n_trees, max_nodes), np.int32)
    max_depth = 0
    for tree in range(n_trees):
        stack = [(0, 0)]
        while stack:
            nd, d = stack.pop()
            depth[tree, nd] = d
            max_depth = max(max_depth, d)
            if not is_leaf[tree, nd]:
                stack.append((int(true_child[tree, nd]), d + 1))
                stack.append((int(false_child[tree, nd]), d + 1))

    return {
        "feature": feature,
        "value": value,
        "true_child": true_child,
        "false_child": false_child,
        "is_leaf": is_leaf,
        "leaf_weights": leaf_weights,
        "classes": np.asarray(classes, np.int64),
        "binary_complement": np.bool_(binary_complement),
        "max_depth": np.int32(max_depth),
        "post_transform": np.bytes_(
            str(attrs.get("post_transform", "NONE")).encode()
        ),
    }


def main():
    src, dst = sys.argv[1], sys.argv[2]
    attrs = parse_tree_ensemble(src)
    dense = densify(attrs)
    np.savez_compressed(dst, **dense)
    lw = dense["leaf_weights"]
    print(
        f"trees={dense['feature'].shape[0]} max_nodes={dense['feature'].shape[1]} "
        f"classes={dense['classes']} max_depth={int(dense['max_depth'])} "
        f"post_transform={dense['post_transform']} "
        f"leaf weight row sums: min={lw.sum(-1)[dense['is_leaf']].min():.4f} "
        f"max={lw.sum(-1)[dense['is_leaf']].max():.4f}"
    )


if __name__ == "__main__":
    main()
