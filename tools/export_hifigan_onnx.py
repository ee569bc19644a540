"""Export the JAX HiFi-GAN generator to an ONNX model (the reference runs
HiFi-GAN through onnxruntime as a first-class inference backend, reference
inference.py:208-223, best_checkpoint.py:230-260; this tool closes the
producer side).

    python tools/export_hifigan_onnx.py --out hifigan.onnx \
        [--checkpoint g_00000000 | orbax dir] [--config config_v1.json]

Neither the ``onnx`` package nor tf2onnx exists in this image, so the
ModelProto is emitted directly via utils/onnx_lite.py — the generator is a
pure Conv / ConvTranspose / LeakyRelu / Tanh / Add / Mul graph (standard
opset-13 ops; loads in stock onnxruntime).  Unlike the TFLite export, the
time axis is DYNAMIC (dim_param "T").  Round-trip-verified against the
JAX generator by tests/test_vocoders.py::test_onnx_export_roundtrip.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

if not __package__:
    try:
        import tacotron2_subword_tpu  # noqa: F401 -- installed package
    except ImportError:  # running from a source checkout
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generator_onnx_graph(params, h):
    """Fused generator params + config → (nodes, initializers) mirroring
    models/hifigan.generator_apply (reference hifigan_model.py:75-116)."""
    from tacotron2_subword_tpu.models.hifigan import get_padding
    from tacotron2_subword_tpu.utils.onnx_lite import Node

    nodes, inits = [], {}
    uid = [0]

    def fresh(tag):
        uid[0] += 1
        return f"{tag}_{uid[0]}"

    def weights(tag, p):
        wn, bn = f"{tag}_w", f"{tag}_b"
        inits[wn] = np.asarray(p["w"], np.float32)
        inits[bn] = np.asarray(p["b"], np.float32)
        return wn, bn

    def conv(x, tag, p, dilation=1, padding=None):
        wn, bn = weights(tag, p)
        if padding is None:
            padding = get_padding(inits[wn].shape[-1], dilation)
        out = fresh(tag)
        nodes.append(Node("Conv", [x, wn, bn], [out],
                          {"pads": [padding, padding],
                           "dilations": [dilation], "strides": [1]}))
        return out

    def convt(x, tag, p, stride, padding):
        wn, bn = weights(tag, p)
        out = fresh(tag)
        nodes.append(Node("ConvTranspose", [x, wn, bn], [out],
                          {"pads": [padding, padding],
                           "strides": [stride]}))
        return out

    def lrelu(x, alpha):
        out = fresh("lrelu")
        nodes.append(Node("LeakyRelu", [x], [out], {"alpha": float(alpha)}))
        return out

    def add(a, b):
        out = fresh("add")
        nodes.append(Node("Add", [a, b], [out]))
        return out

    x = conv("mel", "conv_pre", params["conv_pre"], padding=3)
    nk = len(h.resblock_kernel_sizes)
    inv_nk = "inv_nk"
    inits[inv_nk] = np.asarray([1.0 / nk], np.float32)
    for i, (u, k) in enumerate(zip(h.upsample_rates,
                                   h.upsample_kernel_sizes)):
        x = lrelu(x, 0.1)
        x = convt(x, f"ups_{i}", params["ups"][i], stride=u,
                  padding=(k - u) // 2)
        xs = None
        for j in range(nk):
            rb = params["resblocks"][i * nk + j]
            dils = h.resblock_dilation_sizes[j]
            r = x
            if h.resblock == "1":
                for di, d in enumerate(dils):
                    t = conv(lrelu(r, 0.1), f"rb{i}_{j}_c1_{di}",
                             rb["convs1"][di], dilation=d)
                    t = conv(lrelu(t, 0.1), f"rb{i}_{j}_c2_{di}",
                             rb["convs2"][di], dilation=1)
                    r = add(t, r)
            else:
                for di, d in enumerate(dils):
                    r = add(conv(lrelu(r, 0.1), f"rb{i}_{j}_c_{di}",
                                 rb["convs"][di], dilation=d), r)
            xs = r if xs is None else add(xs, r)
        out = fresh("mrf")
        nodes.append(Node("Mul", [xs, inv_nk], [out]))
        x = out
    x = lrelu(x, 0.01)  # conv_post pre-activation, default torch slope
    x = conv(x, "conv_post", params["conv_post"], padding=3)
    nodes.append(Node("Tanh", [x], ["wav"]))
    return nodes, inits


def export_onnx(params, h, out_path: str) -> int:
    """Serialize generator_apply(params, h, ·) to ONNX; returns bytes
    written.  ``params`` may be weight-normed (fused automatically)."""
    from tacotron2_subword_tpu.models import hifigan as HG
    from tacotron2_subword_tpu.utils import onnx_lite as OX

    fused = HG.fuse_generator(params)
    nodes, inits = generator_onnx_graph(fused, h)
    blob = OX.encode_model(
        nodes, inits,
        inputs={"mel": ["B", h.num_mels, "T"]},
        outputs={"wav": ["B", 1, "T_up"]},
        graph_name="hifigan_generator")
    with open(out_path, "wb") as f:
        f.write(blob)
    return len(blob)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="torch g_???????? ({'generator': ...}) or orbax "
                         "dir; random init when absent")
    ap.add_argument("--config", default=None, help="config_v1.json-style")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from tacotron2_subword_tpu.models import hifigan as HG

    h = (HG.HifiganConfig.from_json(args.config) if args.config
         else HG.HifiganConfig())
    if args.checkpoint and os.path.isdir(args.checkpoint):
        import orbax.checkpoint as ocp
        params = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.checkpoint))
    elif args.checkpoint:
        import torch
        sd = torch.load(args.checkpoint, map_location="cpu")
        params = HG.import_torch_generator(sd["generator"], h)
    else:
        params = HG.init_generator(jax.random.PRNGKey(0), h)
    n = export_onnx(params, h, args.out)
    print(f"wrote {args.out}: {n} bytes")


if __name__ == "__main__":
    main()
