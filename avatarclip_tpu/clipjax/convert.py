"""Convert pretrained CLIP torch checkpoints to avatarclip_tpu pytrees.

One-time host-side conversion (torch-cpu is only needed here, never at
runtime). Two source layouts are supported:

  * OpenAI ``clip`` state dicts (the format the reference loads via
    ``clip.load('ViT-B/32')``): keys like ``visual.transformer.resblocks.0...``
  * HuggingFace ``CLIPModel`` state dicts: keys like
    ``vision_model.encoder.layers.0...``

Converted weights are stored as an ``.npz`` with flattened path keys, loadable
without torch via :func:`load_npz`.
"""

from __future__ import annotations

import numpy as np

from .model import VIT_B32, CLIPConfig


def _tree_flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_tree_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.update(_tree_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _tree_unflatten(flat: dict):
    root: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def save_npz(params, path: str) -> None:
    np.savez_compressed(path, **_tree_flatten(params))


def load_npz(path: str):
    import jax.numpy as jnp

    with np.load(path) as data:
        flat = {k: jnp.asarray(data[k]) for k in data.files}
    return _tree_unflatten(flat)


def _block_from_openai(sd: dict, prefix: str) -> dict:
    g = lambda k: np.asarray(sd[prefix + k], dtype=np.float32)
    return {
        "ln_1": {"scale": g("ln_1.weight"), "bias": g("ln_1.bias")},
        "attn": {
            "in_w": g("attn.in_proj_weight"),
            "in_b": g("attn.in_proj_bias"),
            "out_w": g("attn.out_proj.weight"),
            "out_b": g("attn.out_proj.bias"),
        },
        "ln_2": {"scale": g("ln_2.weight"), "bias": g("ln_2.bias")},
        "mlp": {
            "fc_w": g("mlp.c_fc.weight"),
            "fc_b": g("mlp.c_fc.bias"),
            "proj_w": g("mlp.c_proj.weight"),
            "proj_b": g("mlp.c_proj.bias"),
        },
    }


def from_openai_state_dict(sd: dict, cfg: CLIPConfig = VIT_B32):
    """OpenAI clip ViT state dict (tensors or ndarrays) -> our pytree."""
    sd = {k: np.asarray(v, dtype=np.float32) if not isinstance(v, np.ndarray) else v
          for k, v in _to_numpy(sd).items()}
    # conv1 weight (width, 3, P, P) -> (P*P*3, width) matching our patchify
    conv = sd["visual.conv1.weight"]  # (W, 3, P, P)
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    vis = {
        "patch_w": patch_w,
        "class_embedding": sd["visual.class_embedding"],
        "pos_embed": sd["visual.positional_embedding"],
        "ln_pre": {
            "scale": sd["visual.ln_pre.weight"],
            "bias": sd["visual.ln_pre.bias"],
        },
        "blocks": [
            _block_from_openai(sd, f"visual.transformer.resblocks.{i}.")
            for i in range(cfg.vision_layers)
        ],
        "ln_post": {
            "scale": sd["visual.ln_post.weight"],
            "bias": sd["visual.ln_post.bias"],
        },
        "proj": sd["visual.proj"],
    }
    txt = {
        "token_embedding": sd["token_embedding.weight"],
        "pos_embed": sd["positional_embedding"],
        "blocks": [
            _block_from_openai(sd, f"transformer.resblocks.{i}.")
            for i in range(cfg.text_layers)
        ],
        "ln_final": {
            "scale": sd["ln_final.weight"],
            "bias": sd["ln_final.bias"],
        },
        "text_projection": sd["text_projection"],
    }
    return {
        "visual": vis,
        "text": txt,
        "logit_scale": np.asarray(sd["logit_scale"], np.float32),
    }


def _block_from_hf(sd: dict, prefix: str) -> dict:
    g = lambda k: sd[prefix + k]
    in_w = np.concatenate(
        [g("self_attn.q_proj.weight"), g("self_attn.k_proj.weight"),
         g("self_attn.v_proj.weight")], axis=0,
    )
    in_b = np.concatenate(
        [g("self_attn.q_proj.bias"), g("self_attn.k_proj.bias"),
         g("self_attn.v_proj.bias")], axis=0,
    )
    return {
        "ln_1": {"scale": g("layer_norm1.weight"), "bias": g("layer_norm1.bias")},
        "attn": {
            "in_w": in_w,
            "in_b": in_b,
            "out_w": g("self_attn.out_proj.weight"),
            "out_b": g("self_attn.out_proj.bias"),
        },
        "ln_2": {"scale": g("layer_norm2.weight"), "bias": g("layer_norm2.bias")},
        "mlp": {
            "fc_w": g("mlp.fc1.weight"),
            "fc_b": g("mlp.fc1.bias"),
            "proj_w": g("mlp.fc2.weight"),
            "proj_b": g("mlp.fc2.bias"),
        },
    }


def from_hf_state_dict(sd: dict, cfg: CLIPConfig = VIT_B32):
    """HuggingFace CLIPModel state dict -> our pytree."""
    sd = _to_numpy(sd)
    conv = sd["vision_model.embeddings.patch_embedding.weight"]
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    vis = {
        "patch_w": patch_w,
        "class_embedding": sd["vision_model.embeddings.class_embedding"],
        "pos_embed": sd["vision_model.embeddings.position_embedding.weight"],
        "ln_pre": {
            "scale": sd["vision_model.pre_layrnorm.weight"],
            "bias": sd["vision_model.pre_layrnorm.bias"],
        },
        "blocks": [
            _block_from_hf(sd, f"vision_model.encoder.layers.{i}.")
            for i in range(cfg.vision_layers)
        ],
        "ln_post": {
            "scale": sd["vision_model.post_layernorm.weight"],
            "bias": sd["vision_model.post_layernorm.bias"],
        },
        "proj": sd["visual_projection.weight"].T,
    }
    txt = {
        "token_embedding": sd["text_model.embeddings.token_embedding.weight"],
        "pos_embed": sd["text_model.embeddings.position_embedding.weight"],
        "blocks": [
            _block_from_hf(sd, f"text_model.encoder.layers.{i}.")
            for i in range(cfg.text_layers)
        ],
        "ln_final": {
            "scale": sd["text_model.final_layer_norm.weight"],
            "bias": sd["text_model.final_layer_norm.bias"],
        },
        "text_projection": sd["text_projection.weight"].T,
    }
    return {
        "visual": vis,
        "text": txt,
        "logit_scale": np.asarray(sd["logit_scale"], np.float32),
    }


def _to_numpy(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v, dtype=np.float32)
    return out


def convert_checkpoint(src_path: str, dst_npz: str) -> None:
    """Auto-detect layout, convert, save npz."""
    import torch

    obj = torch.load(src_path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
    else:
        sd = obj
    keys = set(sd.keys())
    if any(k.startswith("visual.conv1") for k in keys):
        params = from_openai_state_dict(sd)
    elif any(k.startswith("vision_model.") for k in keys):
        params = from_hf_state_dict(sd)
    else:
        raise ValueError("unrecognized CLIP checkpoint layout")
    save_npz(params, dst_npz)


def load_pretrained(path: str | None = None):
    """Best-available CLIP params: npz on disk, else deterministic random.

    Loading REAL weights without the real BPE vocab is a hard error: the
    hashed-tokenizer fallback would feed garbage token ids into a real text
    encoder and produce confidently wrong guidance with no warning at all
    (the random-init warning only fires on the weights side). The two
    fallbacks must degrade together.
    """
    import jax

    from .. import assets
    from . import model as m
    from . import tokenizer as tk

    p = path or assets.find("clip_vit_b32.npz")
    if p and p.endswith(".npz"):
        if isinstance(tk.default_tokenizer(), tk.HashedTokenizer):
            raise RuntimeError(
                "Pretrained CLIP weights found at "
                f"{p!r} but the BPE merges file "
                "(bpe_simple_vocab_16e6.txt.gz) is not discoverable — the "
                "hashed-tokenizer fallback would silently produce wrong "
                "text embeddings against real weights. Place the vocab "
                "next to the weights (or remove the weights to run with "
                "the loud random-init fallback)."
            )
        return load_npz(p), True
    return m.init_params(jax.random.PRNGKey(42)), False
