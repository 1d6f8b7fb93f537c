"""HF checkpoint -> vdx param-tree conversion.

Converts diffusers/transformers torch checkpoints (SD-1.5 UNet + AnimateDiff
motion adapter, AutoencoderKL, CLIP text encoder — the model zoo the
reference pulls from the hub, reference experiments/01:55-87) into our Flax
param trees.

Layout transforms:
  * Conv:   torch OIHW  -> flax HWIO   (transpose 2,3,1,0)
  * Dense:  torch [out,in] -> flax [in,out] (transpose)
  * Norms:  weight/bias -> scale/bias
  * Embeds: identical

The converter is *target-driven*: it walks OUR param tree, derives the
expected HF key for every leaf via the rules below, and fails loudly with
the full list of unmatched paths — silent transposes on a 1.3B-param model
are the #1 conversion hazard (SURVEY.md §7 hard parts).

In the zero-egress build environment there are no real checkpoints; the
mapping logic is exercised by tests/test_convert.py against synthetic
state dicts shaped from the rules themselves + our tiny configs.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

# ----------------------------------------------------------------------
# transforms
# ----------------------------------------------------------------------


def t_conv(w):  # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def t_dense(w):  # [out, in] -> [in, out]
    return np.transpose(np.asarray(w), (1, 0))


def t_id(w):
    return np.asarray(w)


def t_conv3d(w):  # torch OITHW -> flax THWIO
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def t_conv3d_1x1_dense(w):  # [O, I, 1, 1, 1] 3D shortcut conv -> Dense [I, O]
    w = np.asarray(w)
    return w.reshape(w.shape[0], w.shape[1]).T


def t_patch_conv(w):
    """CogVideoX patch_embed Conv2d [D, C, p, p] -> Dense [p*p*C, D].

    Our DiT flattens patches in (p_h, p_w, C) order (models/cogvideox.py),
    so the conv kernel transposes to HWIO then flattens its input dims.
    """
    w = np.asarray(w)
    D = w.shape[0]
    return w.transpose(2, 3, 1, 0).reshape(-1, D)


# ----------------------------------------------------------------------
# UNetMotion mapping
# ----------------------------------------------------------------------

_ATTN_LEAF = {
    "to_q/kernel": ("attn{j}.to_q.weight", t_dense),
    "to_k/kernel": ("attn{j}.to_k.weight", t_dense),
    "to_v/kernel": ("attn{j}.to_v.weight", t_dense),
    "to_out/kernel": ("attn{j}.to_out.0.weight", t_dense),
    "to_out/bias": ("attn{j}.to_out.0.bias", t_id),
}


def _transformer_block_rules(prefix: str, hf_prefix: str):
    """Rules for one BasicTransformerBlock / TemporalBlock."""
    rules = {}
    for j, attn in ((1, "attn1"), (2, "attn2")):
        for leaf, (hf_leaf, tr) in _ATTN_LEAF.items():
            rules[f"{prefix}/{attn}/{leaf}"] = (
                f"{hf_prefix}.{hf_leaf.format(j=j)}", tr,
            )
    for i in (1, 2, 3):
        rules[f"{prefix}/norm{i}/LayerNorm_0/scale"] = (f"{hf_prefix}.norm{i}.weight", t_id)
        rules[f"{prefix}/norm{i}/LayerNorm_0/bias"] = (f"{hf_prefix}.norm{i}.bias", t_id)
    rules[f"{prefix}/ff/net_0/proj/kernel"] = (f"{hf_prefix}.ff.net.0.proj.weight", t_dense)
    rules[f"{prefix}/ff/net_0/proj/bias"] = (f"{hf_prefix}.ff.net.0.proj.bias", t_id)
    rules[f"{prefix}/ff/net_2/kernel"] = (f"{hf_prefix}.ff.net.2.weight", t_dense)
    rules[f"{prefix}/ff/net_2/bias"] = (f"{hf_prefix}.ff.net.2.bias", t_id)
    return rules


def _resnet_rules(prefix: str, hf_prefix: str):
    rules = {}
    for ours, theirs, tr in [
        ("norm1/scale", "norm1.weight", t_id),
        ("norm1/bias", "norm1.bias", t_id),
        ("conv1/kernel", "conv1.weight", t_conv),
        ("conv1/bias", "conv1.bias", t_id),
        ("time_emb_proj/kernel", "time_emb_proj.weight", t_dense),
        ("time_emb_proj/bias", "time_emb_proj.bias", t_id),
        ("norm2/scale", "norm2.weight", t_id),
        ("norm2/bias", "norm2.bias", t_id),
        ("conv2/kernel", "conv2.weight", t_conv),
        ("conv2/bias", "conv2.bias", t_id),
        ("conv_shortcut/kernel", "conv_shortcut.weight", t_conv),
        ("conv_shortcut/bias", "conv_shortcut.bias", t_id),
    ]:
        rules[f"{prefix}/{ours}"] = (f"{hf_prefix}.{theirs}", tr)
    return rules


def _spatial_transformer_rules(prefix: str, hf_prefix: str, depth: int = 1):
    rules = {
        f"{prefix}/norm/scale": (f"{hf_prefix}.norm.weight", t_id),
        f"{prefix}/norm/bias": (f"{hf_prefix}.norm.bias", t_id),
        f"{prefix}/proj_in/kernel": (f"{hf_prefix}.proj_in.weight", t_conv),
        f"{prefix}/proj_in/bias": (f"{hf_prefix}.proj_in.bias", t_id),
        f"{prefix}/proj_out/kernel": (f"{hf_prefix}.proj_out.weight", t_conv),
        f"{prefix}/proj_out/bias": (f"{hf_prefix}.proj_out.bias", t_id),
    }
    for d in range(depth):
        rules.update(
            _transformer_block_rules(
                f"{prefix}/blocks_{d}", f"{hf_prefix}.transformer_blocks.{d}"
            )
        )
    return rules


def _motion_rules(prefix: str, hf_prefix: str, depth: int = 1):
    rules = {
        f"{prefix}/norm_scale": (f"{hf_prefix}.norm.weight", t_id),
        f"{prefix}/norm_bias": (f"{hf_prefix}.norm.bias", t_id),
        f"{prefix}/proj_in/kernel": (f"{hf_prefix}.proj_in.weight", t_dense),
        f"{prefix}/proj_in/bias": (f"{hf_prefix}.proj_in.bias", t_id),
        f"{prefix}/proj_out/kernel": (f"{hf_prefix}.proj_out.weight", t_dense),
        f"{prefix}/proj_out/bias": (f"{hf_prefix}.proj_out.bias", t_id),
    }
    for d in range(depth):
        rules.update(
            _transformer_block_rules(
                f"{prefix}/blocks_{d}", f"{hf_prefix}.transformer_blocks.{d}"
            )
        )
    return rules


def unet_motion_rules(config) -> Dict[str, Tuple[str, Callable]]:
    """Our param path -> (HF state_dict key, transform) for UNetMotion."""
    rules: Dict[str, Tuple[str, Callable]] = {
        "conv_in/kernel": ("conv_in.weight", t_conv),
        "conv_in/bias": ("conv_in.bias", t_id),
        "time_embedding/linear_1/kernel": ("time_embedding.linear_1.weight", t_dense),
        "time_embedding/linear_1/bias": ("time_embedding.linear_1.bias", t_id),
        "time_embedding/linear_2/kernel": ("time_embedding.linear_2.weight", t_dense),
        "time_embedding/linear_2/bias": ("time_embedding.linear_2.bias", t_id),
        "conv_norm_out/scale": ("conv_norm_out.weight", t_id),
        "conv_norm_out/bias": ("conv_norm_out.bias", t_id),
        "conv_out/kernel": ("conv_out.weight", t_conv),
        "conv_out/bias": ("conv_out.bias", t_id),
    }
    n = len(config.block_out_channels)
    L = config.layers_per_block
    for bi in range(n):
        for li in range(L):
            rules.update(
                _resnet_rules(f"down_{bi}_{li}_resnet", f"down_blocks.{bi}.resnets.{li}")
            )
            if config.down_block_has_attn[bi]:
                rules.update(
                    _spatial_transformer_rules(
                        f"down_{bi}_{li}_attn", f"down_blocks.{bi}.attentions.{li}",
                        config.transformer_depth,
                    )
                )
            rules.update(
                _motion_rules(
                    f"down_{bi}_{li}_motion", f"down_blocks.{bi}.motion_modules.{li}"
                )
            )
        if bi < n - 1:
            rules.update(
                {
                    f"down_{bi}_downsample/conv/kernel": (
                        f"down_blocks.{bi}.downsamplers.0.conv.weight", t_conv,
                    ),
                    f"down_{bi}_downsample/conv/bias": (
                        f"down_blocks.{bi}.downsamplers.0.conv.bias", t_id,
                    ),
                }
            )
    rules.update(_resnet_rules("mid_resnet_0", "mid_block.resnets.0"))
    rules.update(_resnet_rules("mid_resnet_1", "mid_block.resnets.1"))
    rules.update(
        _spatial_transformer_rules(
            "mid_attn", "mid_block.attentions.0", config.transformer_depth
        )
    )
    rules.update(_motion_rules("mid_motion", "mid_block.motion_modules.0"))
    for bi in range(n):
        for li in range(L + 1):
            rules.update(
                _resnet_rules(f"up_{bi}_{li}_resnet", f"up_blocks.{bi}.resnets.{li}")
            )
            if config.up_block_has_attn[bi]:
                rules.update(
                    _spatial_transformer_rules(
                        f"up_{bi}_{li}_attn", f"up_blocks.{bi}.attentions.{li}",
                        config.transformer_depth,
                    )
                )
            rules.update(
                _motion_rules(f"up_{bi}_{li}_motion", f"up_blocks.{bi}.motion_modules.{li}")
            )
        if bi < n - 1:
            rules.update(
                {
                    f"up_{bi}_upsample/conv/kernel": (
                        f"up_blocks.{bi}.upsamplers.0.conv.weight", t_conv,
                    ),
                    f"up_{bi}_upsample/conv/bias": (
                        f"up_blocks.{bi}.upsamplers.0.conv.bias", t_id,
                    ),
                }
            )
    return rules


# ----------------------------------------------------------------------
# AutoencoderKL mapping
# ----------------------------------------------------------------------


def _vae_resnet_rules(prefix: str, hf_prefix: str):
    rules = {}
    for ours, theirs, tr in [
        ("norm1/scale", "norm1.weight", t_id),
        ("norm1/bias", "norm1.bias", t_id),
        ("conv1/kernel", "conv1.weight", t_conv),
        ("conv1/bias", "conv1.bias", t_id),
        ("norm2/scale", "norm2.weight", t_id),
        ("norm2/bias", "norm2.bias", t_id),
        ("conv2/kernel", "conv2.weight", t_conv),
        ("conv2/bias", "conv2.bias", t_id),
        ("conv_shortcut/kernel", "conv_shortcut.weight", t_conv),
        ("conv_shortcut/bias", "conv_shortcut.bias", t_id),
    ]:
        rules[f"{prefix}/{ours}"] = (f"{hf_prefix}.{theirs}", tr)
    return rules


def _vae_attn_rules(prefix: str, hf_prefix: str):
    # diffusers VAE attention kernels are 1x1 convs in old ckpts / linears in
    # new ones; we target the linear (Attention) layout used since 0.18.
    rules = {
        f"{prefix}/group_norm/scale": (f"{hf_prefix}.group_norm.weight", t_id),
        f"{prefix}/group_norm/bias": (f"{hf_prefix}.group_norm.bias", t_id),
    }
    for ours, theirs in [("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"),
                         ("to_out", "to_out.0")]:
        rules[f"{prefix}/{ours}/kernel"] = (f"{hf_prefix}.{theirs}.weight", t_dense)
        rules[f"{prefix}/{ours}/bias"] = (f"{hf_prefix}.{theirs}.bias", t_id)
    return rules


def vae_rules(config) -> Dict[str, Tuple[str, Callable]]:
    """Our AutoencoderKL param path -> diffusers AutoencoderKL key."""
    rules: Dict[str, Tuple[str, Callable]] = {}
    n = len(config.block_out_channels)
    L = config.layers_per_block

    # ---- encoder ----
    e = "encoder"
    rules[f"{e}/conv_in/kernel"] = ("encoder.conv_in.weight", t_conv)
    rules[f"{e}/conv_in/bias"] = ("encoder.conv_in.bias", t_id)
    for bi in range(n):
        for li in range(L):
            rules.update(_vae_resnet_rules(
                f"{e}/down_{bi}_{li}", f"encoder.down_blocks.{bi}.resnets.{li}"))
        if bi < n - 1:
            rules[f"{e}/down_{bi}_downsample/kernel"] = (
                f"encoder.down_blocks.{bi}.downsamplers.0.conv.weight", t_conv)
            rules[f"{e}/down_{bi}_downsample/bias"] = (
                f"encoder.down_blocks.{bi}.downsamplers.0.conv.bias", t_id)
    rules.update(_vae_resnet_rules(f"{e}/mid/resnet_0", "encoder.mid_block.resnets.0"))
    rules.update(_vae_resnet_rules(f"{e}/mid/resnet_1", "encoder.mid_block.resnets.1"))
    rules.update(_vae_attn_rules(f"{e}/mid/attn", "encoder.mid_block.attentions.0"))
    rules[f"{e}/conv_norm_out/scale"] = ("encoder.conv_norm_out.weight", t_id)
    rules[f"{e}/conv_norm_out/bias"] = ("encoder.conv_norm_out.bias", t_id)
    rules[f"{e}/conv_out/kernel"] = ("encoder.conv_out.weight", t_conv)
    rules[f"{e}/conv_out/bias"] = ("encoder.conv_out.bias", t_id)
    rules[f"{e}/quant_conv/kernel"] = ("quant_conv.weight", t_conv)
    rules[f"{e}/quant_conv/bias"] = ("quant_conv.bias", t_id)

    # ---- decoder ----
    d = "decoder"
    rules[f"{d}/post_quant_conv/kernel"] = ("post_quant_conv.weight", t_conv)
    rules[f"{d}/post_quant_conv/bias"] = ("post_quant_conv.bias", t_id)
    rules[f"{d}/conv_in/kernel"] = ("decoder.conv_in.weight", t_conv)
    rules[f"{d}/conv_in/bias"] = ("decoder.conv_in.bias", t_id)
    rules.update(_vae_resnet_rules(f"{d}/mid/resnet_0", "decoder.mid_block.resnets.0"))
    rules.update(_vae_resnet_rules(f"{d}/mid/resnet_1", "decoder.mid_block.resnets.1"))
    rules.update(_vae_attn_rules(f"{d}/mid/attn", "decoder.mid_block.attentions.0"))
    for bi in range(n):
        for li in range(L + 1):
            rules.update(_vae_resnet_rules(
                f"{d}/up_{bi}_{li}", f"decoder.up_blocks.{bi}.resnets.{li}"))
        if bi < n - 1:
            rules[f"{d}/up_{bi}_upsample/conv/kernel"] = (
                f"decoder.up_blocks.{bi}.upsamplers.0.conv.weight", t_conv)
            rules[f"{d}/up_{bi}_upsample/conv/bias"] = (
                f"decoder.up_blocks.{bi}.upsamplers.0.conv.bias", t_id)
    rules[f"{d}/conv_norm_out/scale"] = ("decoder.conv_norm_out.weight", t_id)
    rules[f"{d}/conv_norm_out/bias"] = ("decoder.conv_norm_out.bias", t_id)
    rules[f"{d}/conv_out/kernel"] = ("decoder.conv_out.weight", t_conv)
    rules[f"{d}/conv_out/bias"] = ("decoder.conv_out.bias", t_id)
    return rules


# ----------------------------------------------------------------------
# CLIP text mapping
# ----------------------------------------------------------------------


def clip_text_rules(config) -> Dict[str, Tuple[str, Callable]]:
    """Our CLIPTextModel param path -> transformers CLIPTextModel key."""
    P = "text_model"
    rules: Dict[str, Tuple[str, Callable]] = {
        "token_embedding/embedding": (f"{P}.embeddings.token_embedding.weight", t_id),
        "position_embedding": (f"{P}.embeddings.position_embedding.weight", t_id),
        "final_layer_norm/scale": (f"{P}.final_layer_norm.weight", t_id),
        "final_layer_norm/bias": (f"{P}.final_layer_norm.bias", t_id),
    }
    for i in range(config.num_layers):
        lp = f"layers_{i}"
        hp = f"{P}.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            rules[f"{lp}/{ln}/scale"] = (f"{hp}.{ln}.weight", t_id)
            rules[f"{lp}/{ln}/bias"] = (f"{hp}.{ln}.bias", t_id)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            rules[f"{lp}/self_attn/{proj}/kernel"] = (
                f"{hp}.self_attn.{proj}.weight", t_dense)
            rules[f"{lp}/self_attn/{proj}/bias"] = (
                f"{hp}.self_attn.{proj}.bias", t_id)
        for fc in ("fc1", "fc2"):
            rules[f"{lp}/{fc}/kernel"] = (f"{hp}.mlp.{fc}.weight", t_dense)
            rules[f"{lp}/{fc}/bias"] = (f"{hp}.mlp.{fc}.bias", t_id)
    return rules


# ----------------------------------------------------------------------
# T5 encoder mapping (CogVideoX text tower)
# ----------------------------------------------------------------------


def t5_encoder_rules(config) -> Dict[str, Tuple[str, Callable]]:
    """Our T5Encoder param path -> transformers T5EncoderModel key."""
    rules: Dict[str, Tuple[str, Callable]] = {
        "token_embedding/embedding": ("shared.weight", t_id),
        "final_norm/scale": ("encoder.final_layer_norm.weight", t_id),
    }
    for i in range(config.num_layers):
        lp = f"layers_{i}"
        hb = f"encoder.block.{i}"
        rules[f"{lp}/norm1/scale"] = (f"{hb}.layer.0.layer_norm.weight", t_id)
        rules[f"{lp}/norm2/scale"] = (f"{hb}.layer.1.layer_norm.weight", t_id)
        for p in ("q", "k", "v", "o"):
            rules[f"{lp}/attn/{p}/kernel"] = (
                f"{hb}.layer.0.SelfAttention.{p}.weight", t_dense,
            )
        if i == 0:
            rules[f"{lp}/attn/relative_attention_bias"] = (
                f"{hb}.layer.0.SelfAttention.relative_attention_bias.weight", t_id,
            )
        for ff in ("wi_0", "wi_1", "wo"):
            rules[f"{lp}/{ff}/kernel"] = (
                f"{hb}.layer.1.DenseReluDense.{ff}.weight", t_dense,
            )
    return rules


# ----------------------------------------------------------------------
# SVD UNetSpatioTemporal mapping
# (diffusers UNetSpatioTemporalConditionModel key space; capability target
#  BASELINE.json configs[2], SURVEY.md §2b "Rebuild as")
# ----------------------------------------------------------------------


def _svd_res_rules(prefix: str, hf_prefix: str):
    """SpatioTemporalResBlock: spatial resnet + temporal 3x1x1 resnet + mixer."""
    rules = _resnet_rules(f"{prefix}/spatial", f"{hf_prefix}.spatial_res_block")
    for ours, theirs, tr in [
        ("tnorm1/scale", "temporal_res_block.norm1.weight", t_id),
        ("tnorm1/bias", "temporal_res_block.norm1.bias", t_id),
        ("tconv1/kernel", "temporal_res_block.conv1.weight", t_conv3d),
        ("tconv1/bias", "temporal_res_block.conv1.bias", t_id),
        ("ttime_emb_proj/kernel", "temporal_res_block.time_emb_proj.weight", t_dense),
        ("ttime_emb_proj/bias", "temporal_res_block.time_emb_proj.bias", t_id),
        ("tnorm2/scale", "temporal_res_block.norm2.weight", t_id),
        ("tnorm2/bias", "temporal_res_block.norm2.bias", t_id),
        ("tconv2/kernel", "temporal_res_block.conv2.weight", t_conv3d),
        ("tconv2/bias", "temporal_res_block.conv2.bias", t_id),
        ("mix/mix_factor", "time_mixer.mix_factor", t_id),
    ]:
        rules[f"{prefix}/{ours}"] = (f"{hf_prefix}.{theirs}", tr)
    return rules


def _svd_attn_rules(prefix: str, hf_prefix: str):
    """TransformerSpatioTemporal: spatial + temporal transformer pair."""
    rules = {
        f"{prefix}/norm/scale": (f"{hf_prefix}.norm.weight", t_id),
        f"{prefix}/norm/bias": (f"{hf_prefix}.norm.bias", t_id),
        f"{prefix}/proj_in/kernel": (f"{hf_prefix}.proj_in.weight", t_dense),
        f"{prefix}/proj_in/bias": (f"{hf_prefix}.proj_in.bias", t_id),
        f"{prefix}/proj_out/kernel": (f"{hf_prefix}.proj_out.weight", t_dense),
        f"{prefix}/proj_out/bias": (f"{hf_prefix}.proj_out.bias", t_id),
        f"{prefix}/mix/mix_factor": (f"{hf_prefix}.time_mixer.mix_factor", t_id),
    }
    rules.update(_transformer_block_rules(
        f"{prefix}/spatial_block", f"{hf_prefix}.transformer_blocks.0"))
    rules.update(_transformer_block_rules(
        f"{prefix}/temporal_block", f"{hf_prefix}.temporal_transformer_blocks.0"))
    return rules


def svd_unet_rules(config) -> Dict[str, Tuple[str, Callable]]:
    """Our UNetSpatioTemporal param path -> diffusers SVD UNet key."""
    rules: Dict[str, Tuple[str, Callable]] = {
        "conv_in/kernel": ("conv_in.weight", t_conv),
        "conv_in/bias": ("conv_in.bias", t_id),
        "conv_norm_out/scale": ("conv_norm_out.weight", t_id),
        "conv_norm_out/bias": ("conv_norm_out.bias", t_id),
        "conv_out/kernel": ("conv_out.weight", t_conv),
        "conv_out/bias": ("conv_out.bias", t_id),
    }
    for ours, theirs in [("time_embedding", "time_embedding"),
                         ("add_embedding", "add_embedding")]:
        for i in (1, 2):
            rules[f"{ours}/linear_{i}/kernel"] = (f"{theirs}.linear_{i}.weight", t_dense)
            rules[f"{ours}/linear_{i}/bias"] = (f"{theirs}.linear_{i}.bias", t_id)
    n = len(config.block_out_channels)
    L = config.layers_per_block
    for bi in range(n):
        for li in range(L):
            rules.update(_svd_res_rules(
                f"down_{bi}_{li}_res", f"down_blocks.{bi}.resnets.{li}"))
            if config.down_block_has_attn[bi]:
                rules.update(_svd_attn_rules(
                    f"down_{bi}_{li}_attn", f"down_blocks.{bi}.attentions.{li}"))
        if bi < n - 1:
            rules[f"down_{bi}_downsample/conv/kernel"] = (
                f"down_blocks.{bi}.downsamplers.0.conv.weight", t_conv)
            rules[f"down_{bi}_downsample/conv/bias"] = (
                f"down_blocks.{bi}.downsamplers.0.conv.bias", t_id)
    rules.update(_svd_res_rules("mid_0_res", "mid_block.resnets.0"))
    rules.update(_svd_attn_rules("mid_0_attn", "mid_block.attentions.0"))
    rules.update(_svd_res_rules("mid_res_1", "mid_block.resnets.1"))
    for bi in range(n):
        for li in range(L + 1):
            rules.update(_svd_res_rules(
                f"up_{bi}_{li}_res", f"up_blocks.{bi}.resnets.{li}"))
            if config.up_block_has_attn[bi]:
                rules.update(_svd_attn_rules(
                    f"up_{bi}_{li}_attn", f"up_blocks.{bi}.attentions.{li}"))
        if bi < n - 1:
            rules[f"up_{bi}_upsample/conv/kernel"] = (
                f"up_blocks.{bi}.upsamplers.0.conv.weight", t_conv)
            rules[f"up_{bi}_upsample/conv/bias"] = (
                f"up_blocks.{bi}.upsamplers.0.conv.bias", t_id)
    return rules


# ----------------------------------------------------------------------
# SVD TemporalDecoder mapping (diffusers AutoencoderKLTemporalDecoder)
# ----------------------------------------------------------------------


def _tdec_res_rules(prefix: str, hf_prefix: str):
    """_DecoderSTResBlock: spatial resnet (no temb) + temporal resnet + mixer."""
    rules = {}
    for ours, theirs, tr in [
        ("spatial/norm1/scale", "spatial_res_block.norm1.weight", t_id),
        ("spatial/norm1/bias", "spatial_res_block.norm1.bias", t_id),
        ("spatial/conv1/kernel", "spatial_res_block.conv1.weight", t_conv),
        ("spatial/conv1/bias", "spatial_res_block.conv1.bias", t_id),
        ("spatial/norm2/scale", "spatial_res_block.norm2.weight", t_id),
        ("spatial/norm2/bias", "spatial_res_block.norm2.bias", t_id),
        ("spatial/conv2/kernel", "spatial_res_block.conv2.weight", t_conv),
        ("spatial/conv2/bias", "spatial_res_block.conv2.bias", t_id),
        ("spatial/conv_shortcut/kernel", "spatial_res_block.conv_shortcut.weight", t_conv),
        ("spatial/conv_shortcut/bias", "spatial_res_block.conv_shortcut.bias", t_id),
        ("tnorm1/scale", "temporal_res_block.norm1.weight", t_id),
        ("tnorm1/bias", "temporal_res_block.norm1.bias", t_id),
        ("tconv1/kernel", "temporal_res_block.conv1.weight", t_conv3d),
        ("tconv1/bias", "temporal_res_block.conv1.bias", t_id),
        ("tnorm2/scale", "temporal_res_block.norm2.weight", t_id),
        ("tnorm2/bias", "temporal_res_block.norm2.bias", t_id),
        ("tconv2/kernel", "temporal_res_block.conv2.weight", t_conv3d),
        ("tconv2/bias", "temporal_res_block.conv2.bias", t_id),
        ("mix_factor", "time_mixer.mix_factor", t_id),
    ]:
        rules[f"{prefix}/{ours}"] = (f"{hf_prefix}.{theirs}", tr)
    return rules


def temporal_decoder_rules(config) -> Dict[str, Tuple[str, Callable]]:
    """Our TemporalDecoder param path -> diffusers temporal-decoder key."""
    rules: Dict[str, Tuple[str, Callable]] = {
        "conv_in/kernel": ("decoder.conv_in.weight", t_conv),
        "conv_in/bias": ("decoder.conv_in.bias", t_id),
        "conv_norm_out/scale": ("decoder.conv_norm_out.weight", t_id),
        "conv_norm_out/bias": ("decoder.conv_norm_out.bias", t_id),
        "conv_out/kernel": ("decoder.conv_out.weight", t_conv),
        "conv_out/bias": ("decoder.conv_out.bias", t_id),
        "time_conv_out/kernel": ("decoder.time_conv_out.weight", t_conv3d),
        "time_conv_out/bias": ("decoder.time_conv_out.bias", t_id),
    }
    rules.update(_tdec_res_rules("mid_resnet_0", "decoder.mid_block.resnets.0"))
    rules.update(_tdec_res_rules("mid_resnet_1", "decoder.mid_block.resnets.1"))
    rules.update(_vae_attn_rules("mid_attn", "decoder.mid_block.attentions.0"))
    n = len(config.block_out_channels)
    for bi in range(n):
        for li in range(config.layers_per_block + 1):
            rules.update(_tdec_res_rules(
                f"up_{bi}_{li}", f"decoder.up_blocks.{bi}.resnets.{li}"))
        if bi < n - 1:
            rules[f"up_{bi}_upsample/conv/kernel"] = (
                f"decoder.up_blocks.{bi}.upsamplers.0.conv.weight", t_conv)
            rules[f"up_{bi}_upsample/conv/bias"] = (
                f"decoder.up_blocks.{bi}.upsamplers.0.conv.bias", t_id)
    return rules


# ----------------------------------------------------------------------
# CLIP vision tower mapping (transformers CLIPVisionModelWithProjection)
# ----------------------------------------------------------------------


def clip_vision_rules(config) -> Dict[str, Tuple[str, Callable]]:
    V = "vision_model"
    rules: Dict[str, Tuple[str, Callable]] = {
        "patch_embed/kernel": (f"{V}.embeddings.patch_embedding.weight", t_conv),
        "class_embedding": (f"{V}.embeddings.class_embedding", t_id),
        "position_embedding": (f"{V}.embeddings.position_embedding.weight", t_id),
        # transformers' historical key spelling is "pre_layrnorm"
        "pre_ln/scale": (f"{V}.pre_layrnorm.weight", t_id),
        "pre_ln/bias": (f"{V}.pre_layrnorm.bias", t_id),
        "post_ln/scale": (f"{V}.post_layernorm.weight", t_id),
        "post_ln/bias": (f"{V}.post_layernorm.bias", t_id),
        "visual_projection/kernel": ("visual_projection.weight", t_dense),
    }
    for i in range(config.num_layers):
        lp, hp = f"layers_{i}", f"{V}.encoder.layers.{i}"
        rules[f"{lp}/ln1/scale"] = (f"{hp}.layer_norm1.weight", t_id)
        rules[f"{lp}/ln1/bias"] = (f"{hp}.layer_norm1.bias", t_id)
        rules[f"{lp}/ln2/scale"] = (f"{hp}.layer_norm2.weight", t_id)
        rules[f"{lp}/ln2/bias"] = (f"{hp}.layer_norm2.bias", t_id)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            rules[f"{lp}/{proj}/kernel"] = (f"{hp}.self_attn.{proj}.weight", t_dense)
            rules[f"{lp}/{proj}/bias"] = (f"{hp}.self_attn.{proj}.bias", t_id)
        for fc in ("fc1", "fc2"):
            rules[f"{lp}/{fc}/kernel"] = (f"{hp}.mlp.{fc}.weight", t_dense)
            rules[f"{lp}/{fc}/bias"] = (f"{hp}.mlp.{fc}.bias", t_id)
    return rules


# ----------------------------------------------------------------------
# CogVideoX DiT mapping (diffusers CogVideoXTransformer3DModel)
# ----------------------------------------------------------------------


def cogvideox_dit_rules(config) -> Dict[str, Tuple[str, Callable]]:
    rules: Dict[str, Tuple[str, Callable]] = {
        "patch_embed/kernel": ("patch_embed.proj.weight", t_patch_conv),
        "patch_embed/bias": ("patch_embed.proj.bias", t_id),
        "text_proj/kernel": ("patch_embed.text_proj.weight", t_dense),
        "text_proj/bias": ("patch_embed.text_proj.bias", t_id),
        "time_embedding/linear_1/kernel": ("time_embedding.linear_1.weight", t_dense),
        "time_embedding/linear_1/bias": ("time_embedding.linear_1.bias", t_id),
        "time_embedding/linear_2/kernel": ("time_embedding.linear_2.weight", t_dense),
        "time_embedding/linear_2/bias": ("time_embedding.linear_2.bias", t_id),
        "final_norm/scale": ("norm_final.weight", t_id),
        "final_norm/bias": ("norm_final.bias", t_id),
        "norm_out_linear/kernel": ("norm_out.linear.weight", t_dense),
        "norm_out_linear/bias": ("norm_out.linear.bias", t_id),
        "norm_out/scale": ("norm_out.norm.weight", t_id),
        "norm_out/bias": ("norm_out.norm.bias", t_id),
        "final_proj/kernel": ("proj_out.weight", t_dense),
        "final_proj/bias": ("proj_out.bias", t_id),
    }
    for i in range(config.depth):
        bp, hp = f"blocks_{i}", f"transformer_blocks.{i}"
        for nz in ("norm1", "norm2"):
            rules[f"{bp}/{nz}/linear/kernel"] = (f"{hp}.{nz}.linear.weight", t_dense)
            rules[f"{bp}/{nz}/linear/bias"] = (f"{hp}.{nz}.linear.bias", t_id)
            rules[f"{bp}/{nz}/norm/scale"] = (f"{hp}.{nz}.norm.weight", t_id)
            rules[f"{bp}/{nz}/norm/bias"] = (f"{hp}.{nz}.norm.bias", t_id)
        for proj in ("to_q", "to_k", "to_v"):
            rules[f"{bp}/attn/{proj}/kernel"] = (f"{hp}.attn1.{proj}.weight", t_dense)
            rules[f"{bp}/attn/{proj}/bias"] = (f"{hp}.attn1.{proj}.bias", t_id)
        rules[f"{bp}/attn/to_out/kernel"] = (f"{hp}.attn1.to_out.0.weight", t_dense)
        rules[f"{bp}/attn/to_out/bias"] = (f"{hp}.attn1.to_out.0.bias", t_id)
        for qk in ("norm_q", "norm_k"):
            rules[f"{bp}/attn/{qk}/scale"] = (f"{hp}.attn1.{qk}.weight", t_id)
            rules[f"{bp}/attn/{qk}/bias"] = (f"{hp}.attn1.{qk}.bias", t_id)
        rules[f"{bp}/ff_in/kernel"] = (f"{hp}.ff.net.0.proj.weight", t_dense)
        rules[f"{bp}/ff_in/bias"] = (f"{hp}.ff.net.0.proj.bias", t_id)
        rules[f"{bp}/ff_out/kernel"] = (f"{hp}.ff.net.2.weight", t_dense)
        rules[f"{bp}/ff_out/bias"] = (f"{hp}.ff.net.2.bias", t_id)
    return rules


# ----------------------------------------------------------------------
# ModelScope UNet3D mapping (diffusers UNet3DConditionModel)
# ----------------------------------------------------------------------


def _temporal_conv_rules(prefix: str, hf_prefix: str):
    """TemporalConvLayer: conv{1..4} = Sequential(GroupNorm, SiLU, Conv3d)."""
    rules = {}
    for i in range(4):
        rules[f"{prefix}/norm{i}/scale"] = (f"{hf_prefix}.conv{i + 1}.0.weight", t_id)
        rules[f"{prefix}/norm{i}/bias"] = (f"{hf_prefix}.conv{i + 1}.0.bias", t_id)
        rules[f"{prefix}/conv{i}/kernel"] = (f"{hf_prefix}.conv{i + 1}.2.weight", t_conv3d)
        rules[f"{prefix}/conv{i}/bias"] = (f"{hf_prefix}.conv{i + 1}.2.bias", t_id)
    return rules


def unet3d_rules(config) -> Dict[str, Tuple[str, Callable]]:
    """Our UNet3D param path -> diffusers UNet3DConditionModel key.

    Layout check vs text-to-video-ms-1.7b (NOTES_r2 #10): per layer
    resnet -> temp_conv -> attention -> temp_attention, plus the
    transformer_in temporal transformer after conv_in — all present here
    with matching key structure.
    """
    rules: Dict[str, Tuple[str, Callable]] = {
        "conv_in/kernel": ("conv_in.weight", t_conv),
        "conv_in/bias": ("conv_in.bias", t_id),
        "time_embedding/linear_1/kernel": ("time_embedding.linear_1.weight", t_dense),
        "time_embedding/linear_1/bias": ("time_embedding.linear_1.bias", t_id),
        "time_embedding/linear_2/kernel": ("time_embedding.linear_2.weight", t_dense),
        "time_embedding/linear_2/bias": ("time_embedding.linear_2.bias", t_id),
        "conv_norm_out/scale": ("conv_norm_out.weight", t_id),
        "conv_norm_out/bias": ("conv_norm_out.bias", t_id),
        "conv_out/kernel": ("conv_out.weight", t_conv),
        "conv_out/bias": ("conv_out.bias", t_id),
    }
    rules.update(_motion_rules("transformer_in", "transformer_in"))
    n = len(config.block_out_channels)
    L = config.layers_per_block
    for bi in range(n):
        for li in range(L):
            base = f"down_blocks.{bi}"
            rules.update(_resnet_rules(
                f"down_{bi}_{li}_resnet", f"{base}.resnets.{li}"))
            rules.update(_temporal_conv_rules(
                f"down_{bi}_{li}_tconv", f"{base}.temp_convs.{li}"))
            if config.down_block_has_attn[bi]:
                rules.update(_spatial_transformer_rules(
                    f"down_{bi}_{li}_attn", f"{base}.attentions.{li}"))
                rules.update(_motion_rules(
                    f"down_{bi}_{li}_tattn", f"{base}.temp_attentions.{li}"))
        if bi < n - 1:
            rules[f"down_{bi}_downsample/conv/kernel"] = (
                f"down_blocks.{bi}.downsamplers.0.conv.weight", t_conv)
            rules[f"down_{bi}_downsample/conv/bias"] = (
                f"down_blocks.{bi}.downsamplers.0.conv.bias", t_id)
    rules.update(_resnet_rules("mid_0_resnet", "mid_block.resnets.0"))
    rules.update(_temporal_conv_rules("mid_0_tconv", "mid_block.temp_convs.0"))
    rules.update(_spatial_transformer_rules("mid_0_attn", "mid_block.attentions.0"))
    rules.update(_motion_rules("mid_0_tattn", "mid_block.temp_attentions.0"))
    rules.update(_resnet_rules("mid_resnet_1", "mid_block.resnets.1"))
    rules.update(_temporal_conv_rules("mid_tconv_1", "mid_block.temp_convs.1"))
    for bi in range(n):
        for li in range(L + 1):
            base = f"up_blocks.{bi}"
            rules.update(_resnet_rules(
                f"up_{bi}_{li}_resnet", f"{base}.resnets.{li}"))
            rules.update(_temporal_conv_rules(
                f"up_{bi}_{li}_tconv", f"{base}.temp_convs.{li}"))
            if config.up_block_has_attn[bi]:
                rules.update(_spatial_transformer_rules(
                    f"up_{bi}_{li}_attn", f"{base}.attentions.{li}"))
                rules.update(_motion_rules(
                    f"up_{bi}_{li}_tattn", f"{base}.temp_attentions.{li}"))
        if bi < n - 1:
            rules[f"up_{bi}_upsample/conv/kernel"] = (
                f"up_blocks.{bi}.upsamplers.0.conv.weight", t_conv)
            rules[f"up_{bi}_upsample/conv/bias"] = (
                f"up_blocks.{bi}.upsamplers.0.conv.bias", t_id)
    return rules


# ----------------------------------------------------------------------
# Latte DiT mapping (diffusers LatteTransformer3DModel)
# ----------------------------------------------------------------------


def t_flatten(w):  # [6, D] scale_shift_table -> adaLN bias [6*D]
    return np.asarray(w).reshape(-1)


def t_bias_plus_table(bias, table):
    """adaLN bias: global adaln_single linear bias + per-block table.

    The checkpoint's block modulation is
    ``scale_shift_table[None] + (W @ silu(emb) + b)`` — our per-block
    AdaLNModulation folds it as kernel=W, bias=(b + table.flatten())."""
    return np.asarray(bias) + np.asarray(table).reshape(-1)


def latte_dit_rules(config) -> Dict[str, Tuple[str, Callable]]:
    """Our LatteDiT param path -> diffusers Latte key.

    Latte factorises adaLN as ONE global linear (adaln_single, WITH bias)
    plus a per-block scale_shift_table added to its output; our per-block
    AdaLNModulation reproduces that exactly when every block's kernel
    loads the global linear and its bias loads the global bias + block
    table (modulation = kernel @ silu(c) + bias == global(c) + table).
    The final modulation is table + raw embedded timestep — a bare
    [2, D] table param in our model (models/dit.py).

    Numerics pinned vs a hand-written torch mirror of the block at
    tests/test_block_parity.py::test_latte_dit_block_matches_torch.
    """
    rules: Dict[str, Tuple[str, Callable]] = {
        "patch_embed/kernel": ("pos_embed.proj.weight", t_patch_conv),
        "patch_embed/bias": ("pos_embed.proj.bias", t_id),
        "t_proj_1/kernel": ("adaln_single.emb.timestep_embedder.linear_1.weight", t_dense),
        "t_proj_1/bias": ("adaln_single.emb.timestep_embedder.linear_1.bias", t_id),
        "t_proj_2/kernel": ("adaln_single.emb.timestep_embedder.linear_2.weight", t_dense),
        "t_proj_2/bias": ("adaln_single.emb.timestep_embedder.linear_2.bias", t_id),
        "final_scale_shift_table": ("scale_shift_table", t_id),
        "final_proj/kernel": ("proj_out.weight", t_dense),
        "final_proj/bias": ("proj_out.bias", t_id),
    }
    for i in range(config.depth):
        bp = f"blocks_{i}"
        spatial = i % 2 == 0
        hp = (f"transformer_blocks.{i // 2}" if spatial
              else f"temporal_transformer_blocks.{i // 2}")
        rules[f"{bp}/adaln/proj/kernel"] = ("adaln_single.linear.weight", t_dense)
        rules[f"{bp}/adaln/proj/bias"] = (
            ("adaln_single.linear.bias", f"{hp}.scale_shift_table"),
            t_bias_plus_table,
        )
        for ours, theirs in [("attn", "attn1"), ("cross_attn", "attn2")]:
            for proj in ("to_q", "to_k", "to_v"):
                rules[f"{bp}/{ours}/{proj}/kernel"] = (
                    f"{hp}.{theirs}.{proj}.weight", t_dense)
            rules[f"{bp}/{ours}/to_out/kernel"] = (
                f"{hp}.{theirs}.to_out.0.weight", t_dense)
            rules[f"{bp}/{ours}/to_out/bias"] = (
                f"{hp}.{theirs}.to_out.0.bias", t_id)
        rules[f"{bp}/mlp/net_0/proj/kernel"] = (f"{hp}.ff.net.0.proj.weight", t_dense)
        rules[f"{bp}/mlp/net_0/proj/bias"] = (f"{hp}.ff.net.0.proj.bias", t_id)
        rules[f"{bp}/mlp/net_2/kernel"] = (f"{hp}.ff.net.2.weight", t_dense)
        rules[f"{bp}/mlp/net_2/bias"] = (f"{hp}.ff.net.2.bias", t_id)
    return rules


# Historical: leaves with no Latte checkpoint counterpart. Empty since the
# final modulation became a bare table param (models/dit.py) — every Latte
# leaf now converts.
LATTE_UNCOVERED: Tuple[str, ...] = ()


# ----------------------------------------------------------------------
# CogVideoX 3D causal VAE mapping (diffusers AutoencoderKLCogVideoX)
# ----------------------------------------------------------------------


def _causal_res_rules(prefix: str, hf_prefix: str):
    rules = {}
    for ours, theirs, tr in [
        ("norm1/scale", "norm1.weight", t_id),
        ("norm1/bias", "norm1.bias", t_id),
        ("conv1/conv/kernel", "conv1.conv.weight", t_conv3d),
        ("conv1/conv/bias", "conv1.conv.bias", t_id),
        ("norm2/scale", "norm2.weight", t_id),
        ("norm2/bias", "norm2.bias", t_id),
        ("conv2/conv/kernel", "conv2.conv.weight", t_conv3d),
        ("conv2/conv/bias", "conv2.conv.bias", t_id),
        ("shortcut/kernel", "conv_shortcut.weight", t_conv3d_1x1_dense),
        ("shortcut/bias", "conv_shortcut.bias", t_id),
    ]:
        rules[f"{prefix}/{ours}"] = (f"{hf_prefix}.{theirs}", tr)
    return rules


def causal_vae_encoder_rules(config) -> Dict[str, Tuple[str, Callable]]:
    rules: Dict[str, Tuple[str, Callable]] = {
        "conv_in/conv/kernel": ("encoder.conv_in.conv.weight", t_conv3d),
        "conv_in/conv/bias": ("encoder.conv_in.conv.bias", t_id),
        "norm_out/scale": ("encoder.norm_out.weight", t_id),
        "norm_out/bias": ("encoder.norm_out.bias", t_id),
        "conv_out/conv/kernel": ("encoder.conv_out.conv.weight", t_conv3d),
        "conv_out/conv/bias": ("encoder.conv_out.conv.bias", t_id),
    }
    n = len(config.block_out_channels)
    for bi in range(n):
        for li in range(config.layers_per_block):
            rules.update(_causal_res_rules(
                f"down_{bi}_{li}", f"encoder.down_blocks.{bi}.resnets.{li}"))
        if bi < n - 1:
            rules[f"down_{bi}_ds/conv/kernel"] = (
                f"encoder.down_blocks.{bi}.downsamplers.0.conv.weight", t_conv3d)
            rules[f"down_{bi}_ds/conv/bias"] = (
                f"encoder.down_blocks.{bi}.downsamplers.0.conv.bias", t_id)
    rules.update(_causal_res_rules("mid_0", "encoder.mid_block.resnets.0"))
    rules.update(_causal_res_rules("mid_1", "encoder.mid_block.resnets.1"))
    return rules


def causal_vae_decoder_rules(config) -> Dict[str, Tuple[str, Callable]]:
    """Decoder rules.

    Known simplification: diffusers' decoder norms are latent-conditioned
    CogVideoXSpatialNorm3D; ours are plain GroupNorm mapped to each spatial
    norm's ``norm_layer`` — the conditioning convs stay unused and are
    listed in the conversion report.
    """
    rules: Dict[str, Tuple[str, Callable]] = {
        "conv_in/conv/kernel": ("decoder.conv_in.conv.weight", t_conv3d),
        "conv_in/conv/bias": ("decoder.conv_in.conv.bias", t_id),
        "norm_out/scale": ("decoder.norm_out.norm_layer.weight", t_id),
        "norm_out/bias": ("decoder.norm_out.norm_layer.bias", t_id),
        "conv_out/conv/kernel": ("decoder.conv_out.conv.weight", t_conv3d),
        "conv_out/conv/bias": ("decoder.conv_out.conv.bias", t_id),
    }
    rules.update(_causal_res_rules("mid_0", "decoder.mid_block.resnets.0"))
    rules.update(_causal_res_rules("mid_1", "decoder.mid_block.resnets.1"))
    n = len(config.block_out_channels)
    for bi in range(n):
        for li in range(config.layers_per_block + 1):
            rules.update(_causal_res_rules(
                f"up_{bi}_{li}", f"decoder.up_blocks.{bi}.resnets.{li}"))
        if bi < n - 1:
            rules[f"up_{bi}_us/conv/kernel"] = (
                f"decoder.up_blocks.{bi}.upsamplers.0.conv.weight", t_conv3d)
            rules[f"up_{bi}_us/conv/bias"] = (
                f"decoder.up_blocks.{bi}.upsamplers.0.conv.bias", t_id)
    return rules


# ----------------------------------------------------------------------
# generic application
# ----------------------------------------------------------------------


def flatten_params(params) -> Dict[str, np.ndarray]:
    """Flax param tree -> {slash/path: leaf} (excluding the 'params' root)."""
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [getattr(k, "key", getattr(k, "idx", str(k))) for k in path]
        if keys and keys[0] == "params":
            keys = keys[1:]
        flat["/".join(str(k) for k in keys)] = leaf
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, leaf in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return {"params": tree}


def convert_checkpoint(
    state_dict: Dict[str, np.ndarray],
    template_params,
    rules: Dict[str, Tuple[str, Callable]],
    strict: bool = True,
):
    """Apply mapping rules to fill our param tree from a torch state dict.

    template_params: our init'd (or eval_shape'd) tree — defines the targets.
    Returns (params, report) where report lists missing/unused keys.
    """
    flat_template = flatten_params(template_params)
    out: Dict[str, np.ndarray] = {}
    missing, shape_errors = [], []
    used = set()

    for path, leaf in flat_template.items():
        if path not in rules:
            missing.append(f"no rule for {path}")
            out[path] = leaf
            continue
        hf_key, transform = rules[path]
        # A rule may combine SEVERAL checkpoint tensors into one leaf
        # (hf_key = tuple; transform receives them positionally) — e.g.
        # Latte's per-block adaLN bias = global linear bias + block table.
        keys = hf_key if isinstance(hf_key, tuple) else (hf_key,)
        absent = [k for k in keys if k not in state_dict]
        if absent:
            missing.append(f"checkpoint missing {absent[0]} (for {path})")
            out[path] = leaf
            continue
        w = transform(*(state_dict[k] for k in keys))
        used.update(keys)
        if tuple(w.shape) != tuple(leaf.shape):
            shape_errors.append(f"{path}: got {w.shape}, want {tuple(leaf.shape)}")
            out[path] = leaf
            continue
        # leaf may be a ShapeDtypeStruct (eval_shape template) — read .dtype
        # directly; np.asarray() on one yields a dtype=object scalar array.
        out[path] = w.astype(getattr(leaf, "dtype", np.float32))

    report = {
        "missing": missing,
        "shape_errors": shape_errors,
        "unused_checkpoint_keys": sorted(set(state_dict) - used),
    }
    if strict and (missing or shape_errors):
        raise ValueError(
            "checkpoint conversion failed:\n"
            + "\n".join(missing[:20] + shape_errors[:20])
            + (f"\n... and {len(missing) + len(shape_errors) - 40} more"
               if len(missing) + len(shape_errors) > 40 else "")
        )
    return unflatten_params(out), report


def load_safetensors(path) -> Dict[str, np.ndarray]:
    """Load a .safetensors file to numpy (host-side, no torch needed)."""
    from safetensors.numpy import load_file

    return load_file(str(path))


def merge_unet_and_motion(
    unet_sd: Dict[str, np.ndarray], motion_sd: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Merge SD-1.5 UNet weights with a MotionAdapter checkpoint.

    The hub ships them separately (reference experiments/01:60-73 loads
    guoyww/animatediff-motion-adapter-v1-5-2 on top of
    runwayml/stable-diffusion-v1-5); diffusers injects the adapter's
    ``*.motion_modules.*`` keys into the UNet state dict. Key spaces are
    disjoint by construction; overlaps raise.
    """
    overlap = set(unet_sd) & set(motion_sd)
    if overlap:
        raise ValueError(f"overlapping keys: {sorted(overlap)[:5]}")
    merged = dict(unet_sd)
    merged.update(motion_sd)
    return merged


def load_animatediff_unet(
    unet_path, motion_path, config, template_params, strict: bool = True
):
    """Convenience: safetensors pair -> UNetMotion params."""
    sd = merge_unet_and_motion(load_safetensors(unet_path), load_safetensors(motion_path))
    return convert_checkpoint(sd, template_params, unet_motion_rules(config), strict)
