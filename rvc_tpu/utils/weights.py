"""Weight conversion and checkpoint I/O.

Capability parity with the reference's converter suite
(`tools/convert_rvc_model.py`, `convert_hubert.py`, `convert_rmvpe.py`):
ingests upstream PyTorch state dicts (both old `weight_g`/`weight_v` and
new `parametrizations.weight.original0/1` weight-norm naming), fuses the
norm, transposes conv layouts to this framework's canonical storage, and
remaps module paths onto our flax param tree. Native checkpoints are
flat safetensors with '/'-joined keys plus a JSON config sidecar.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Mapping

import numpy as np


# ---------------------------------------------------------------------------
# tree <-> flat helpers
# ---------------------------------------------------------------------------


def flatten_tree(tree: Mapping, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_tree(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def unflatten_tree(flat: Mapping[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


# ---------------------------------------------------------------------------
# torch state-dict ingestion
# ---------------------------------------------------------------------------


def fuse_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold weight-norm (g, v) pairs into plain weights.

    Handles both naming schemes: ``X.weight_g``/``X.weight_v`` and
    ``X.parametrizations.weight.original0``/``original1``. torch
    weight_norm uses dim=0: w = g * v / ||v|| over all non-leading dims.
    """
    out: Dict[str, np.ndarray] = {}
    done = set()
    for k in list(sd.keys()):
        if k in done:
            continue
        m = re.match(r"(.*)\.parametrizations\.weight\.original0$", k)
        if m is None:
            m = re.match(r"(.*)\.weight_g$", k)
            vkey = f"{m.group(1)}.weight_v" if m else None
        else:
            vkey = f"{m.group(1)}.parametrizations.weight.original1"
        if m and vkey in sd:
            g = np.asarray(sd[k], dtype=np.float32)
            v = np.asarray(sd[vkey], dtype=np.float32)
            # weight_norm dim is implied by g's broadcast shape: norm over
            # every axis g collapses (dim=0 convs -> (C,1,1); HF pos_conv
            # uses dim=2 -> (1,1,K)).
            axes = tuple(i for i, s in enumerate(g.shape) if s == 1) or tuple(range(1, v.ndim))
            norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
            out[f"{m.group(1)}.weight"] = g * v / np.maximum(norm, 1e-12)
            done.update({k, vkey})
        elif not re.search(r"\.(weight_g|weight_v|parametrizations\.)", k):
            out[k] = np.asarray(sd[k])
            done.add(k)
    return out


def _t_conv1d(w):  # torch (Cout, Cin//g, K) -> (K, Cin//g, Cout)
    return np.transpose(w, (2, 1, 0))


def _t_convtr1d(w):  # torch (Cin, Cout, K) -> (K, Cin, Cout)
    return np.transpose(w, (2, 0, 1))


def _t_conv2d(w):  # torch (Cout, Cin//g, KH, KW) -> (KH, KW, Cin//g, Cout)
    return np.transpose(w, (2, 3, 1, 0))


def _t_convtr2d(w):  # torch (Cin, Cout, KH, KW) -> (KH, KW, Cin, Cout)
    return np.transpose(w, (2, 3, 0, 1))


# Synthesizer translation rules: (regex on the fused torch key, path
# template with \g<n> backrefs, weight transform or None).
_SYNTH_RULES = [
    (r"^enc_p\.emb_phone\.(weight|bias)$", r"enc_p/emb_phone/\1", None),
    (r"^enc_p\.emb_pitch\.weight$", r"enc_p/emb_pitch/weight", None),
    (r"^enc_p\.encoder\.attn_layers\.(\d+)\.emb_rel_([kv])$",
     r"enc_p/encoder/attn_layers_\1/emb_rel_\2", None),
    (r"^enc_p\.encoder\.attn_layers\.(\d+)\.conv_([qkvo])\.weight$",
     r"enc_p/encoder/attn_layers_\1/conv_\2/weight", _t_conv1d),
    (r"^enc_p\.encoder\.attn_layers\.(\d+)\.conv_([qkvo])\.bias$",
     r"enc_p/encoder/attn_layers_\1/conv_\2/bias", None),
    (r"^enc_p\.encoder\.norm_layers_([12])\.(\d+)\.gamma$",
     r"enc_p/encoder/norm_layers_\1_\2/weight", None),
    (r"^enc_p\.encoder\.norm_layers_([12])\.(\d+)\.beta$",
     r"enc_p/encoder/norm_layers_\1_\2/bias", None),
    (r"^enc_p\.encoder\.ffn_layers\.(\d+)\.conv_([12])\.weight$",
     r"enc_p/encoder/ffn_layers_\1/conv_\2/weight", _t_conv1d),
    (r"^enc_p\.encoder\.ffn_layers\.(\d+)\.conv_([12])\.bias$",
     r"enc_p/encoder/ffn_layers_\1/conv_\2/bias", None),
    (r"^enc_p\.proj\.weight$", r"enc_p/proj/weight", _t_conv1d),
    (r"^enc_p\.proj\.bias$", r"enc_p/proj/bias", None),
    # enc_q / flow WaveNets
    (r"^(enc_q|flow\.flows\.\d+)\.pre\.weight$", None, _t_conv1d),
    (r"^(enc_q|flow\.flows\.\d+)\.pre\.bias$", None, None),
    (r"^(enc_q|flow\.flows\.\d+)\.(proj|post)\.weight$", None, _t_conv1d),
    (r"^(enc_q|flow\.flows\.\d+)\.(proj|post)\.bias$", None, None),
    (r"^(enc_q|flow\.flows\.\d+)\.enc\.(in_layers|res_skip_layers)\.(\d+)\.weight$", None, _t_conv1d),
    (r"^(enc_q|flow\.flows\.\d+)\.enc\.(in_layers|res_skip_layers)\.(\d+)\.bias$", None, None),
    (r"^(enc_q|flow\.flows\.\d+)\.enc\.cond_layer\.weight$", None, _t_conv1d),
    (r"^(enc_q|flow\.flows\.\d+)\.enc\.cond_layer\.bias$", None, None),
    # decoder
    (r"^dec\.conv_(pre|post)\.weight$", r"dec/conv_\1/weight", _t_conv1d),
    (r"^dec\.conv_(pre|post)\.bias$", r"dec/conv_\1/bias", None),
    (r"^dec\.cond\.weight$", r"dec/cond/weight", _t_conv1d),
    (r"^dec\.cond\.bias$", r"dec/cond/bias", None),
    (r"^dec\.ups\.(\d+)\.weight$", r"dec/ups_\1/weight", _t_convtr1d),
    (r"^dec\.ups\.(\d+)\.bias$", r"dec/ups_\1/bias", None),
    (r"^dec\.noise_convs\.(\d+)\.weight$", r"dec/noise_convs_\1/weight", _t_conv1d),
    (r"^dec\.noise_convs\.(\d+)\.bias$", r"dec/noise_convs_\1/bias", None),
    (r"^dec\.resblocks\.(\d+)\.convs([12])\.(\d+)\.weight$",
     r"dec/resblocks_\1/convs\2_\3/weight", _t_conv1d),
    (r"^dec\.resblocks\.(\d+)\.convs([12])\.(\d+)\.bias$",
     r"dec/resblocks_\1/convs\2_\3/bias", None),
    (r"^dec\.m_source\.l_linear\.(weight|bias)$", r"dec/m_source/l_linear/\1", None),
    # MRF HiFi-GAN decoder (`rvc/lib/algorithm/generators/hifigan_mrf.py`)
    (r"^dec\.upsamples\.(\d+)\.weight$", r"dec/upsamples_\1/weight", _t_convtr1d),
    (r"^dec\.upsamples\.(\d+)\.bias$", r"dec/upsamples_\1/bias", None),
    (r"^dec\.mrfs\.(\d+)\.(\d+)\.layers\.(\d+)\.conv([12])\.weight$",
     r"dec/mrfs_\1_\2/layers_\3/conv\4/weight", _t_conv1d),
    (r"^dec\.mrfs\.(\d+)\.(\d+)\.layers\.(\d+)\.conv([12])\.bias$",
     r"dec/mrfs_\1_\2/layers_\3/conv\4/bias", None),
    # RefineGAN decoder (`rvc/lib/algorithm/generators/refinegan.py`)
    (r"^dec\.(pre_conv|mel_conv)\.weight$", r"dec/\1/weight", _t_conv1d),
    (r"^dec\.(pre_conv|mel_conv)\.bias$", r"dec/\1/bias", None),
    (r"^dec\.downsample_blocks\.(\d+)\.weight$",
     r"dec/downsample_blocks_\1/weight", _t_conv1d),
    (r"^dec\.downsample_blocks\.(\d+)\.bias$",
     r"dec/downsample_blocks_\1/bias", None),
    (r"^dec\.upsample_conv_blocks\.(\d+)\.input_conv\.weight$",
     r"dec/upsample_conv_blocks_\1/input_conv/weight", _t_conv1d),
    (r"^dec\.upsample_conv_blocks\.(\d+)\.input_conv\.bias$",
     r"dec/upsample_conv_blocks_\1/input_conv/bias", None),
    (r"^dec\.upsample_conv_blocks\.(\d+)\.blocks\.(\d+)\.0\.weight$",
     r"dec/upsample_conv_blocks_\1/adain1_\2/weight", None),
    (r"^dec\.upsample_conv_blocks\.(\d+)\.blocks\.(\d+)\.2\.weight$",
     r"dec/upsample_conv_blocks_\1/adain2_\2/weight", None),
    (r"^dec\.upsample_conv_blocks\.(\d+)\.blocks\.(\d+)\.1\.convs([12])\.(\d+)\.weight$",
     r"dec/upsample_conv_blocks_\1/res_\2/convs\3_\4/weight", _t_conv1d),
    (r"^dec\.upsample_conv_blocks\.(\d+)\.blocks\.(\d+)\.1\.convs([12])\.(\d+)\.bias$",
     r"dec/upsample_conv_blocks_\1/res_\2/convs\3_\4/bias", None),
    (r"^dec\.m_source\.merge\.0\.weight$", r"dec/m_source_merge/weight", None),
    (r"^emb_g\.weight$", r"emb_g/weight", None),
]


def convert_synthesizer_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Fused torch Synthesizer state dict -> our flax param tree.

    The torch flow interleaves Flip modules, so its coupling layers sit at
    indices 0,2,4,6 — remapped here to our flows_0..flows_3.
    """
    sd = fuse_weight_norm({k: np.asarray(v) for k, v in sd.items()})
    flat: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        path = None
        transform = None
        for pat, tmpl, tf in _SYNTH_RULES:
            m = re.match(pat, key)
            if m:
                transform = tf
                if tmpl is not None:
                    path = m.expand(tmpl)
                else:
                    # enc_q / flow wavenet paths: derive mechanically
                    p = key
                    p = re.sub(r"^flow\.flows\.(\d+)\.",
                               lambda mm: f"flow/flows_{int(mm.group(1)) // 2}/", p)
                    p = p.replace("enc_q.", "enc_q/")
                    p = re.sub(r"\.(in_layers|res_skip_layers)\.(\d+)\.", r"/\1_\2/", p)
                    p = p.replace(".enc/", "/enc/").replace("enc.", "enc/")
                    p = p.replace(".weight", "/weight").replace(".bias", "/bias")
                    p = p.replace(".", "/")
                    path = p
                break
        if path is None:
            continue  # enc_q is dropped in inference-only checkpoints etc.
        v = np.asarray(val, dtype=np.float32)
        if transform is not None:
            v = transform(v)
        flat[path] = v
    return unflatten_tree(flat)


# HuBERT translation (HF transformers state dict -> our flax tree).
_HUBERT_RULES = [
    (r"^(?:hubert\.)?feature_extractor\.conv_layers\.(\d+)\.conv\.weight$",
     r"feature_extractor/conv_layers_\1/weight", _t_conv1d),
    (r"^(?:hubert\.)?feature_extractor\.conv_layers\.0\.layer_norm\.weight$",
     r"feature_extractor/gn_weight", None),
    (r"^(?:hubert\.)?feature_extractor\.conv_layers\.0\.layer_norm\.bias$",
     r"feature_extractor/gn_bias", None),
    (r"^(?:hubert\.)?feature_projection\.layer_norm\.(weight|bias)$",
     r"fp_layer_norm/\1", None),
    (r"^(?:hubert\.)?feature_projection\.projection\.(weight|bias)$",
     r"fp_projection/\1", None),
    (r"^(?:hubert\.)?encoder\.pos_conv_embed\.conv\.weight$",
     r"pos_conv_embed/conv/weight", _t_conv1d),
    (r"^(?:hubert\.)?encoder\.pos_conv_embed\.conv\.bias$",
     r"pos_conv_embed/conv/bias", None),
    (r"^(?:hubert\.)?encoder\.layer_norm\.(weight|bias)$",
     r"encoder_layer_norm/\1", None),
    (r"^(?:hubert\.)?encoder\.layers\.(\d+)\.attention\.([qkv]|out)_proj\.(weight|bias)$",
     r"layers_\1/attention/\2_proj/\3", None),
    (r"^(?:hubert\.)?encoder\.layers\.(\d+)\.layer_norm\.(weight|bias)$",
     r"layers_\1/layer_norm/\2", None),
    (r"^(?:hubert\.)?encoder\.layers\.(\d+)\.feed_forward\.(intermediate_dense|output_dense)\.(weight|bias)$",
     r"layers_\1/\2/\3", None),
    (r"^(?:hubert\.)?encoder\.layers\.(\d+)\.final_layer_norm\.(weight|bias)$",
     r"layers_\1/final_layer_norm/\2", None),
    (r"^final_proj\.(weight|bias)$", r"final_proj/\1", None),
]


def convert_hubert_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """HF HubertModel (or ContentVec 'HubertModelWithFinalProj') state dict
    -> our flax param tree."""
    sd = fuse_weight_norm({k: np.asarray(v) for k, v in sd.items()})
    flat: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        for pat, tmpl, tf in _HUBERT_RULES:
            m = re.match(pat, key)
            if m:
                v = np.asarray(val, dtype=np.float32)
                if tf is not None:
                    v = tf(v)
                flat[m.expand(tmpl)] = v
                break
    return unflatten_tree(flat)


# FCPE translation (torch `rvc/lib/predictors/FCPE.py` state dict).
_FCPE_RULES = [
    (r"^stack\.0\.(weight|bias)$", r"stack_conv1/\1", "conv1d"),
    (r"^stack\.1\.weight$", r"stack_gn_weight", None),
    (r"^stack\.1\.bias$", r"stack_gn_bias", None),
    (r"^stack\.3\.(weight|bias)$", r"stack_conv2/\1", "conv1d"),
    (r"^decoder\._layers\.(\d+)\.norm\.(weight|bias)$",
     r"decoder_layers_\1/norm/\2", None),
    (r"^decoder\._layers\.(\d+)\.attn\.to_(q|k|v|out)\.(weight|bias)$",
     r"decoder_layers_\1/attn/to_\2/\3", None),
    (r"^decoder\._layers\.(\d+)\.attn\.fast_attention\.projection_matrix$",
     r"decoder_layers_\1/attn/projection_matrix", None),
    (r"^decoder\._layers\.(\d+)\.conformer\.net\.0\.(weight|bias)$",
     r"decoder_layers_\1/conformer/ln/\2", None),
    (r"^decoder\._layers\.(\d+)\.conformer\.net\.2\.(weight|bias)$",
     r"decoder_layers_\1/conformer/conv_in/\2", "conv1d"),
    (r"^decoder\._layers\.(\d+)\.conformer\.net\.4\.conv\.(weight|bias)$",
     r"decoder_layers_\1/conformer/depthwise/\2", "conv1d"),
    (r"^decoder\._layers\.(\d+)\.conformer\.net\.6\.(weight|bias)$",
     r"decoder_layers_\1/conformer/conv_out/\2", "conv1d"),
    (r"^norm\.(weight|bias)$", r"norm/\1", None),
    (r"^dense_out\.(weight|bias)$", r"dense_out/\1", None),
]


def convert_fcpe_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Torch FCPE state dict (fcpe.pt 'model' entry) -> our flax tree."""
    sd = fuse_weight_norm({k: np.asarray(v) for k, v in sd.items()})
    flat: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        for pat, tmpl, kind in _FCPE_RULES:
            m = re.match(pat, key)
            if m:
                v = np.asarray(val, dtype=np.float32)
                if kind == "conv1d" and key.endswith("weight") and v.ndim == 3:
                    v = _t_conv1d(v)
                flat[m.expand(tmpl)] = v
                break
    return unflatten_tree(flat)


def convert_crepe_state_dict(sd: Dict[str, np.ndarray]):
    """Torchcrepe state dict -> (params, batch_stats) for our CREPEModel.

    Torchcrepe names: conv1..conv6 (Conv2d, weight (Cout, Cin, KH, 1)),
    conv{i}_BN (BatchNorm), classifier (Linear). (The reference converts
    the same source via `tools/convert_crepe_weights.py`.)
    """
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        v = np.asarray(val, dtype=np.float32)
        m = re.match(r"^conv(\d)\.(weight|bias)$", key)
        if m:
            if m.group(2) == "weight":
                v = _t_conv2d(v)
            params[f"conv{m.group(1)}/{m.group(2)}"] = v
            continue
        m = re.match(r"^conv(\d)_BN\.(weight|bias|running_mean|running_var)$", key)
        if m:
            leaf = m.group(2)
            dst = stats if leaf.startswith("running") else params
            dst[f"conv{m.group(1)}_BN/{leaf}"] = v
            continue
        m = re.match(r"^classifier\.(weight|bias)$", key)
        if m:
            params[f"classifier/{m.group(1)}"] = v
    return unflatten_tree(params), unflatten_tree(stats)


def convert_rmvpe_state_dict(sd: Dict[str, np.ndarray]):
    """Torch RMVPE E2E state dict -> (params, batch_stats) flax trees.

    Torch structure (`rvc/lib/predictors/RMVPE.py`): ConvBlockRes.conv is
    Sequential(conv0, bn1, relu, conv3, bn4, relu) + optional shortcut;
    encoder/intermediate nest blocks under ``conv.{j}``, the decoder under
    ``conv2.{j}`` with ``conv1.{0,1}`` being the transposed conv + bn.
    """
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    def put(path: str, key: str, v: np.ndarray, transform=None):
        v = np.asarray(v, dtype=np.float32)
        if transform is not None:
            v = transform(v)
        if key in ("running_mean", "running_var"):
            stats[f"{path}/{key}"] = v
        else:
            params[f"{path}/{key}"] = v

    def block_path(rest: str, base: str):
        """Translate 'conv.{j}.conv.{idx}.{leaf}' / 'conv.{j}.shortcut.{leaf}'."""
        m = re.match(r"conv2?\.(\d+)\.conv\.(\d+)\.(.+)$", rest)
        if m:
            j, idx, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
            sub = {0: ("conv_0", _t_conv2d), 1: ("bn_0", None),
                   3: ("conv_1", _t_conv2d), 4: ("bn_1", None)}[idx]
            tf = sub[1] if leaf == "weight" else None
            return f"{base}/blocks_{j}/{sub[0]}", leaf, tf
        m = re.match(r"conv2?\.(\d+)\.shortcut\.(.+)$", rest)
        if m:
            j, leaf = int(m.group(1)), m.group(2)
            return f"{base}/blocks_{j}/shortcut", leaf, (_t_conv2d if leaf == "weight" else None)
        return None

    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        m = re.match(r"^unet\.encoder\.bn\.(.+)$", key)
        if m:
            put("unet/encoder_bn", m.group(1), val)
            continue
        m = re.match(r"^unet\.(encoder|intermediate|decoder)\.layers\.(\d+)\.(.+)$", key)
        if m:
            section, i, rest = m.group(1), int(m.group(2)), m.group(3)
            base = f"unet/{section}_layers_{i}"
            if section == "decoder":
                mm = re.match(r"conv1\.0\.(.+)$", rest)
                if mm:
                    put(f"{base}/conv1", mm.group(1), val,
                        _t_convtr2d if mm.group(1) == "weight" else None)
                    continue
                mm = re.match(r"conv1\.1\.(.+)$", rest)
                if mm:
                    put(f"{base}/bn1", mm.group(1), val)
                    continue
            got = block_path(rest, base)
            if got:
                path, leaf, tf = got
                put(path, leaf, val, tf)
            continue
        m = re.match(r"^cnn\.(weight|bias)$", key)
        if m:
            put("cnn", m.group(1), val, _t_conv2d if m.group(1) == "weight" else None)
            continue
        m = re.match(r"^fc\.\d+\.gru\.(weight|bias)_(ih|hh)_l0(_reverse)?$", key)
        if m:
            d = "bwd" if m.group(3) else "fwd"
            params[f"gru_{d}_{m.group(1)}_{m.group(2)}"] = np.asarray(val, np.float32)
            continue
        m = re.match(r"^fc\.\d+\.(weight|bias)$", key)
        if m:
            put("fc", m.group(1), val)
            continue
    return unflatten_tree(params), unflatten_tree(stats)


# ---------------------------------------------------------------------------
# native checkpoint I/O (safetensors + json sidecar)
# ---------------------------------------------------------------------------


def save_params(params: Mapping, path: str, config: dict | None = None) -> None:
    from safetensors.numpy import save_file

    flat = {k: np.ascontiguousarray(v) for k, v in flatten_tree(params).items()}
    save_file(flat, path)
    if config is not None:
        with open(os.path.splitext(path)[0] + ".json", "w") as f:
            json.dump(config, f, indent=2)


def load_params(path: str) -> Dict:
    from safetensors.numpy import load_file

    return unflatten_tree(load_file(path))


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth checkpoint (weights_only) into numpy arrays.

    Accepts both raw state dicts and RVC's {'model': ..., 'config': ...}
    inference checkpoints (`rvc/train/process/extract_model.py:27`).
    """
    import torch

    cpt = torch.load(path, map_location="cpu", weights_only=True)
    meta = {}
    # training checkpoints nest under "model" (`rvc/train/utils.py:34`),
    # inference exports under "weight" (`extract_model.py:59`)
    for nest in ("model", "weight"):
        if isinstance(cpt, dict) and nest in cpt and isinstance(cpt[nest], dict):
            meta = {k: v for k, v in cpt.items() if k != nest}
            cpt = cpt[nest]
            break
    out = {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
           for k, v in cpt.items()}
    out["__meta__"] = meta
    return out


# ---------------------------------------------------------------------------
# .pth EXPORT — our flax tree -> the reference's ecosystem checkpoint
# (`rvc/train/process/extract_model.py:27-100`): fp16 "weight" state dict
# in torch naming/layout (weight-norm re-split into parametrizations),
# 18-element config list, metadata + model hash. Models trained here
# round-trip into upstream RVC tooling.

def _inv_conv1d(w):  # ours (K, Cin//g, Cout) -> torch (Cout, Cin//g, K)
    return np.transpose(w, (2, 1, 0))


def _inv_convtr1d(w):  # ours (K, Cin, Cout) -> torch (Cin, Cout, K)
    return np.transpose(w, (1, 2, 0))


# (our-path regex, torch-key template, inverse transform, weight_norm)
_INV_SYNTH_RULES = [
    (r"^enc_p/emb_phone/(weight|bias)$", r"enc_p.emb_phone.\1", None, False),
    (r"^enc_p/emb_pitch/weight$", r"enc_p.emb_pitch.weight", None, False),
    (r"^enc_p/encoder/attn_layers_(\d+)/emb_rel_([kv])$",
     r"enc_p.encoder.attn_layers.\1.emb_rel_\2", None, False),
    (r"^enc_p/encoder/attn_layers_(\d+)/conv_([qkvo])/weight$",
     r"enc_p.encoder.attn_layers.\1.conv_\2.weight", _inv_conv1d, False),
    (r"^enc_p/encoder/attn_layers_(\d+)/conv_([qkvo])/bias$",
     r"enc_p.encoder.attn_layers.\1.conv_\2.bias", None, False),
    (r"^enc_p/encoder/norm_layers_([12])_(\d+)/weight$",
     r"enc_p.encoder.norm_layers_\1.\2.gamma", None, False),
    (r"^enc_p/encoder/norm_layers_([12])_(\d+)/bias$",
     r"enc_p.encoder.norm_layers_\1.\2.beta", None, False),
    (r"^enc_p/encoder/ffn_layers_(\d+)/conv_([12])/weight$",
     r"enc_p.encoder.ffn_layers.\1.conv_\2.weight", _inv_conv1d, False),
    (r"^enc_p/encoder/ffn_layers_(\d+)/conv_([12])/bias$",
     r"enc_p.encoder.ffn_layers.\1.conv_\2.bias", None, False),
    (r"^enc_p/proj/weight$", r"enc_p.proj.weight", _inv_conv1d, False),
    (r"^enc_p/proj/bias$", r"enc_p.proj.bias", None, False),
    # wavenets (enc_q is stripped before export; flow remains)
    (r"^(enc_q|flow/flows_\d+)/pre/weight$", None, _inv_conv1d, False),
    (r"^(enc_q|flow/flows_\d+)/pre/bias$", None, None, False),
    (r"^(enc_q|flow/flows_\d+)/(proj|post)/weight$", None, _inv_conv1d, False),
    (r"^(enc_q|flow/flows_\d+)/(proj|post)/bias$", None, None, False),
    (r"^(enc_q|flow/flows_\d+)/enc/(in_layers|res_skip_layers)_(\d+)/weight$",
     None, _inv_conv1d, True),
    (r"^(enc_q|flow/flows_\d+)/enc/(in_layers|res_skip_layers)_(\d+)/bias$",
     None, None, False),
    (r"^(enc_q|flow/flows_\d+)/enc/cond_layer/weight$", None, _inv_conv1d, True),
    (r"^(enc_q|flow/flows_\d+)/enc/cond_layer/bias$", None, None, False),
    # NSF-HiFiGAN decoder (weight-norm set per
    # `rvc/lib/algorithm/generators/hifigan_nsf.py`)
    (r"^dec/conv_(pre|post)/weight$", r"dec.conv_\1.weight", _inv_conv1d, False),
    (r"^dec/conv_(pre|post)/bias$", r"dec.conv_\1.bias", None, False),
    (r"^dec/cond/weight$", r"dec.cond.weight", _inv_conv1d, False),
    (r"^dec/cond/bias$", r"dec.cond.bias", None, False),
    (r"^dec/ups_(\d+)/weight$", r"dec.ups.\1.weight", _inv_convtr1d, True),
    (r"^dec/ups_(\d+)/bias$", r"dec.ups.\1.bias", None, False),
    (r"^dec/noise_convs_(\d+)/weight$", r"dec.noise_convs.\1.weight",
     _inv_conv1d, False),
    (r"^dec/noise_convs_(\d+)/bias$", r"dec.noise_convs.\1.bias", None, False),
    (r"^dec/resblocks_(\d+)/convs([12])_(\d+)/weight$",
     r"dec.resblocks.\1.convs\2.\3.weight", _inv_conv1d, True),
    (r"^dec/resblocks_(\d+)/convs([12])_(\d+)/bias$",
     r"dec.resblocks.\1.convs\2.\3.bias", None, False),
    (r"^dec/m_source/l_linear/(weight|bias)$", r"dec.m_source.l_linear.\1",
     None, False),
    # MRF HiFi-GAN decoder
    (r"^dec/upsamples_(\d+)/weight$", r"dec.upsamples.\1.weight",
     _inv_convtr1d, True),
    (r"^dec/upsamples_(\d+)/bias$", r"dec.upsamples.\1.bias", None, False),
    (r"^dec/mrfs_(\d+)_(\d+)/layers_(\d+)/conv([12])/weight$",
     r"dec.mrfs.\1.\2.layers.\3.conv\4.weight", _inv_conv1d, True),
    (r"^dec/mrfs_(\d+)_(\d+)/layers_(\d+)/conv([12])/bias$",
     r"dec.mrfs.\1.\2.layers.\3.conv\4.bias", None, False),
    # RefineGAN decoder
    (r"^dec/(pre_conv|mel_conv)/weight$", r"dec.\1.weight", _inv_conv1d, True),
    (r"^dec/(pre_conv|mel_conv)/bias$", r"dec.\1.bias", None, False),
    (r"^dec/downsample_blocks_(\d+)/weight$", r"dec.downsample_blocks.\1.weight",
     _inv_conv1d, True),
    (r"^dec/downsample_blocks_(\d+)/bias$", r"dec.downsample_blocks.\1.bias",
     None, False),
    (r"^dec/upsample_conv_blocks_(\d+)/input_conv/weight$",
     r"dec.upsample_conv_blocks.\1.input_conv.weight", _inv_conv1d, True),
    (r"^dec/upsample_conv_blocks_(\d+)/input_conv/bias$",
     r"dec.upsample_conv_blocks.\1.input_conv.bias", None, False),
    (r"^dec/upsample_conv_blocks_(\d+)/adain([12])_(\d+)/weight$",
     r"dec.upsample_conv_blocks.\1.blocks.\3.\g<2>000", None, False),  # fixed below
    (r"^dec/upsample_conv_blocks_(\d+)/res_(\d+)/convs([12])_(\d+)/weight$",
     r"dec.upsample_conv_blocks.\1.blocks.\2.1.convs\3.\4.weight",
     _inv_conv1d, True),
    (r"^dec/upsample_conv_blocks_(\d+)/res_(\d+)/convs([12])_(\d+)/bias$",
     r"dec.upsample_conv_blocks.\1.blocks.\2.1.convs\3.\4.bias", None, False),
    (r"^dec/m_source_merge/weight$", r"dec.m_source.merge.0.weight", None, False),
    (r"^emb_g/weight$", r"emb_g.weight", None, False),
]


def _wavenet_torch_key(path: str) -> str:
    """Mechanical inverse of the wavenet path derivation in
    `convert_synthesizer_state_dict` (flows_N -> flows.{2N}, layer_N ->
    layer.N)."""
    p = re.sub(r"^flow/flows_(\d+)/",
               lambda m: f"flow.flows.{int(m.group(1)) * 2}.", path)
    p = re.sub(r"/(in_layers|res_skip_layers)_(\d+)/", r".\1.\2.", p)
    return p.replace("/", ".")


def synthesizer_params_to_torch_state_dict(params: Mapping) -> Dict[str, np.ndarray]:
    """Our flax param tree -> fused-layout torch state dict with the
    reference's exact key set (weight-norm re-split as
    `parametrizations.weight.original0/1`, the modern torch naming real
    reference checkpoints carry)."""
    flat = flatten_tree(params)
    out: Dict[str, np.ndarray] = {}
    unmapped = []
    for path, v in flat.items():
        v = np.asarray(v, dtype=np.float32)
        hit = False
        for pat, tmpl, inv_tf, weight_norm in _INV_SYNTH_RULES:
            m = re.match(pat, path)
            if not m:
                continue
            hit = True
            if tmpl is not None:
                key = m.expand(tmpl)
            else:
                key = _wavenet_torch_key(path)
            # AdaIN rule carries a placeholder template; fix it up
            am = re.match(
                r"^dec/upsample_conv_blocks_(\d+)/adain([12])_(\d+)/weight$",
                path)
            if am:
                idx = 0 if am.group(2) == "1" else 2
                key = (f"dec.upsample_conv_blocks.{am.group(1)}.blocks."
                       f"{am.group(3)}.{idx}.weight")
            w = inv_tf(v) if inv_tf is not None else v
            if weight_norm:
                base = key[: -len(".weight")]
                axes = tuple(range(1, w.ndim))
                g = np.sqrt(np.sum(w * w, axis=axes, keepdims=True))
                out[f"{base}.parametrizations.weight.original0"] = g
                out[f"{base}.parametrizations.weight.original1"] = w
            else:
                out[key] = w
            break
        if not hit:
            unmapped.append(path)
    if unmapped:
        raise ValueError(f"no torch mapping for params: {unmapped[:8]}"
                         + ("..." if len(unmapped) > 8 else ""))
    return out


def export_pth(
    params: Mapping,
    cfg,
    path: str,
    *,
    name: str = "model",
    epoch: int = 0,
    step: int = 0,
    version: str = "v2",
    pitch_guidance: bool = True,
    overtrain_info=None,
    author=None,
    embedder_model: str = "contentvec",
    dataset_length=None,
) -> str:
    """Write the reference-format inference .pth
    (`rvc/train/process/extract_model.py:27-100`): enc_q stripped, fp16
    weights, 18-element config list, metadata, sha256 model hash."""
    import datetime
    import hashlib

    import torch

    params = {k: v for k, v in params.items() if k != "enc_q"}
    sd = synthesizer_params_to_torch_state_dict(params)
    m, d = cfg.model, cfg.data
    config = [
        d.filter_length // 2 + 1,
        32,
        m.inter_channels,
        m.hidden_channels,
        m.filter_channels,
        m.n_heads,
        m.n_layers,
        m.kernel_size,
        m.p_dropout,
        str(m.resblock),
        list(m.resblock_kernel_sizes),
        [list(x) for x in m.resblock_dilation_sizes],
        list(m.upsample_rates),
        m.upsample_initial_channel,
        list(m.upsample_kernel_sizes),
        m.spk_embed_dim,
        m.gin_channels,
        d.sample_rate,
    ]
    opt = {
        "weight": {k: torch.from_numpy(np.ascontiguousarray(v)).half()
                   for k, v in sd.items()},
        "config": config,
        "epoch": epoch,
        "step": step,
        "sr": d.sample_rate,
        "f0": int(pitch_guidance),
        "version": version,
        "creation_date": datetime.datetime.now().isoformat(),
        "overtrain_info": overtrain_info,
        "dataset_length": dataset_length,
        "model_name": name,
        "author": author,
        "embedder_model": embedder_model,
        "speakers_id": m.spk_embed_dim,
        "vocoder": m.vocoder,
    }
    hash_input = f"{name}-{epoch}-{step}-{d.sample_rate}-{version}-{config}"
    opt["model_hash"] = hashlib.sha256(hash_input.encode()).hexdigest()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(opt, path)
    return path


def convert_discriminator_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Torch MultiPeriodDiscriminator state dict -> our flax tree.

    Handles all three reference layouts
    (`rvc/lib/algorithm/discriminators.py:25-50`): discriminators.0 is
    DiscriminatorS, then DiscriminatorP per period (v1: 6, v2: 8,
    v3: 5) and, for v3, three DiscriminatorR resolutions. P vs R is
    told apart by kernel shape (P convs are (k, 1), R convs (3, 9)).
    Used by `trainer.load_pretrained` for the stock f0D*.pth pretrains.
    """
    sd = fuse_weight_norm({k: np.asarray(v) for k, v in sd.items()})
    by_idx: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = re.match(r"discriminators\.(\d+)\.(.*)$", k)
        if m:
            by_idx.setdefault(int(m.group(1)), {})[m.group(2)] = v

    def kind(sub):
        w = sub.get("convs.0.weight")
        if w is None or w.ndim == 3:
            return "S"
        return "P" if w.shape[-1] == 1 else "R"

    kinds = {i: kind(sub) for i, sub in by_idx.items()}
    n_p = sum(1 for t in kinds.values() if t == "P")
    periods = {6: [2, 3, 5, 7, 11, 17],
               8: [2, 3, 5, 7, 11, 17, 23, 37],
               5: [2, 3, 5, 7, 11]}.get(n_p, [2, 3, 5, 7, 11, 17, 23, 37])
    resolutions = [1024, 2048, 512]  # DiscriminatorR order (v3)

    flat: Dict[str, np.ndarray] = {}
    p_seen = r_seen = 0
    for i in sorted(by_idx):
        t = kinds[i]
        if t == "S":
            prefix, tf = "disc_s", _t_conv1d
        elif t == "P":
            prefix, tf = f"disc_p_{periods[p_seen]}", _t_conv2d
            p_seen += 1
        else:
            prefix, tf = f"disc_r_{resolutions[r_seen]}", _t_conv2d
            r_seen += 1
        for k, v in by_idx[i].items():
            k2 = re.sub(r"^convs\.(\d+)\.", r"convs_\1/", k)
            k2 = k2.replace("conv_post.", "conv_post/").replace(".", "/")
            v = np.asarray(v, dtype=np.float32)
            if k2.endswith("/weight") and v.ndim >= 3:
                v = tf(v)
            flat[f"{prefix}/{k2}"] = v
    return unflatten_tree(flat)
