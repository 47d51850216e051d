"""Architecture parity oracle: our CLIP vs transformers' CLIPModel.

Builds a small randomly-initialized HuggingFace CLIPModel (no downloads),
converts its state dict through clipjax.convert.from_hf_state_dict, and
checks that image/text embeddings match — validating patch embedding, pre/post
layernorms, attention, QuickGELU MLPs, EOT pooling and the projections
against a completely independent implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from avatarclip_tpu.clipjax import convert, model


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    tcfg = CLIPTextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        hidden_act="quick_gelu",
        bos_token_id=500, eos_token_id=511, pad_token_id=0,
    )
    vcfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
        hidden_act="quick_gelu",
    )
    cfg = CLIPConfig.from_text_vision_configs(tcfg, vcfg, projection_dim=32)
    torch.manual_seed(0)
    hf = CLIPModel(cfg).eval()

    ours_cfg = model.CLIPConfig(
        image_size=32, patch_size=16, vision_width=64, vision_layers=2,
        vision_heads=2, embed_dim=32, context_length=16, vocab_size=512,
        text_width=64, text_layers=2, text_heads=2,
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert.from_hf_state_dict(sd, ours_cfg)
    return hf, params, ours_cfg


def test_image_embeddings_match(hf_pair):
    hf, params, cfg = hf_pair
    rs = np.random.RandomState(0)
    imgs = rs.rand(2, 32, 32, 3).astype(np.float32)
    ours = np.asarray(model.encode_image(params, cfg, jnp.asarray(imgs)))
    with torch.no_grad():
        theirs = hf.get_image_features(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_text_embeddings_match(hf_pair):
    hf, params, cfg = hf_pair
    # HF CLIP pools at the highest token id position when using the original
    # checkpoints' convention (argmax) — same as ours
    toks = np.zeros((2, 16), np.int64)
    toks[0, :5] = [500, 3, 8, 12, 511]
    toks[1, :3] = [500, 40, 511]
    attn = (toks > 0).astype(np.int64)
    attn[:, 0] = 1
    ours = np.asarray(
        model.encode_text(params, cfg, jnp.asarray(toks.astype(np.int32)))
    )
    with torch.no_grad():
        theirs = hf.get_text_features(
            input_ids=torch.from_numpy(toks),
            attention_mask=torch.from_numpy(attn),
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
