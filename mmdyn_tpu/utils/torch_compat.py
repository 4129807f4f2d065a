"""Weight conversion between mmdyn_tpu flax params and the reference's torch
state_dict layout (mmdyn/pytorch/models/vae.py + models.py module naming).

Layout notes:
* conv kernels: flax (kh, kw, in, out) <-> torch (out, in, kh, kw);
* transposed-conv kernels: flax stores the correlated orientation
  (see models/layers.py): torch_w[i, o, a, b] = flax[kh-1-a, kw-1-b, i, o];
* the encoder FC reads an NHWC-flattened 5x5x256 bottleneck while torch reads
  NCHW-flattened — rows/columns are permuted accordingly;
* BatchNorm: the reference never uses running statistics (always train mode),
  so exports fill running_mean=0 / running_var=1 and imports ignore them.

All values are numpy arrays; the torch tensor conversion happens in the CLI
tools (tools/export_torch_ckpt.py / tools/import_torch_ckpt.py).
"""

from __future__ import annotations

import numpy as np


def _nhwc_to_nchw_perm(h=5, w=5, c=256):
    """index map: NCHW-flat position -> NHWC-flat position."""
    return np.arange(h * w * c).reshape(h, w, c).transpose(2, 0, 1).reshape(-1)


def _conv_fwd(k):
    return np.asarray(k).transpose(3, 2, 0, 1)


def _conv_bwd(w):
    return np.asarray(w).transpose(2, 3, 1, 0)


def _deconv_fwd(k):
    k = np.asarray(k)
    return k[::-1, ::-1].copy().transpose(2, 3, 0, 1)


def _deconv_bwd(w):
    w = np.asarray(w).transpose(2, 3, 0, 1)   # (kh, kw, in, out)
    return w[::-1, ::-1].copy()


def _lin_fwd(k):
    return np.asarray(k).T


def _lin_bwd(w):
    return np.asarray(w).T


def _bn_export(out, prefix, p):
    out[prefix + ".weight"] = np.asarray(p["scale"])
    out[prefix + ".bias"] = np.asarray(p["bias"])
    out[prefix + ".running_mean"] = np.zeros_like(p["bias"])
    out[prefix + ".running_var"] = np.ones_like(p["scale"])
    out[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


# --- encoder -----------------------------------------------------------------

_ENC_CONV = [("conv_0", "conv_net.0"), ("conv_1", "conv_net.2"),
             ("conv_2", "conv_net.5"), ("conv_3", "conv_net.8")]
_ENC_BN = [("bn_1", "conv_net.3"), ("bn_2", "conv_net.6"), ("bn_3", "conv_net.9")]


def encoder_to_torch(params, prefix=""):
    out = {}
    if "conv_0" in params:  # cnn
        for fl, th in _ENC_CONV:
            out[prefix + th + ".weight"] = _conv_fwd(params[fl]["kernel"])
        for fl, th in _ENC_BN:
            _bn_export(out, prefix + th, params[fl])
        perm = _nhwc_to_nchw_perm()
        fk = np.asarray(params["fc"]["kernel"])
        out[prefix + "fc_net.0.weight"] = fk[perm].T
        out[prefix + "fc_net.0.bias"] = np.asarray(params["fc"]["bias"])
    else:  # mlp
        j = 0
        while f"linear_{j}" in params.get("fc_net", {}):
            lp = params["fc_net"][f"linear_{j}"]
            out[prefix + f"fc_net.{2 * j}.weight"] = _lin_fwd(lp["kernel"])
            out[prefix + f"fc_net.{2 * j}.bias"] = np.asarray(lp["bias"])
            j += 1
    for head in ("linear_means", "linear_log_var"):
        out[prefix + head + ".weight"] = _lin_fwd(params[head]["kernel"])
        out[prefix + head + ".bias"] = np.asarray(params[head]["bias"])
    return out


def encoder_from_torch(sd, prefix=""):
    p = {}
    if prefix + "conv_net.0.weight" in sd:
        for fl, th in _ENC_CONV:
            p[fl] = {"kernel": _conv_bwd(sd[prefix + th + ".weight"])}
        for fl, th in _ENC_BN:
            p[fl] = {"scale": np.asarray(sd[prefix + th + ".weight"]),
                     "bias": np.asarray(sd[prefix + th + ".bias"])}
        perm = _nhwc_to_nchw_perm()
        inv = np.argsort(perm)
        w = np.asarray(sd[prefix + "fc_net.0.weight"])
        p["fc"] = {"kernel": w.T[inv], "bias": np.asarray(sd[prefix + "fc_net.0.bias"])}
    else:
        fc = {}
        j = 0
        while prefix + f"fc_net.{2 * j}.weight" in sd:
            fc[f"linear_{j}"] = {
                "kernel": _lin_bwd(sd[prefix + f"fc_net.{2 * j}.weight"]),
                "bias": np.asarray(sd[prefix + f"fc_net.{2 * j}.bias"])}
            j += 1
        p["fc_net"] = fc
    for head in ("linear_means", "linear_log_var"):
        p[head] = {"kernel": _lin_bwd(sd[prefix + head + ".weight"]),
                   "bias": np.asarray(sd[prefix + head + ".bias"])}
    return p


# --- decoder -----------------------------------------------------------------

_DEC_DECONV = [("deconv_0", "hallucinate.0"), ("deconv_1", "hallucinate.3"),
               ("deconv_2", "hallucinate.6"), ("deconv_3", "hallucinate.9")]
_DEC_BN = [("bn_0", "hallucinate.1"), ("bn_1", "hallucinate.4"),
           ("bn_2", "hallucinate.7")]


def decoder_to_torch(params, prefix=""):
    out = {}
    if "upsample" in params:  # cnn
        perm = _nhwc_to_nchw_perm()
        uk = np.asarray(params["upsample"]["kernel"])
        out[prefix + "upsample.0.weight"] = uk[:, perm].T
        # output units are permuted too, so the bias follows the same map
        out[prefix + "upsample.0.bias"] = np.asarray(params["upsample"]["bias"])[perm]
        for fl, th in _DEC_DECONV:
            out[prefix + th + ".weight"] = _deconv_fwd(params[fl]["kernel"])
        for fl, th in _DEC_BN:
            _bn_export(out, prefix + th, params[fl])
    else:  # mlp
        j = 0
        while f"linear_{j}" in params.get("deconv_net", {}):
            lp = params["deconv_net"][f"linear_{j}"]
            out[prefix + f"deconv_net.{2 * j}.weight"] = _lin_fwd(lp["kernel"])
            out[prefix + f"deconv_net.{2 * j}.bias"] = np.asarray(lp["bias"])
            j += 1
    return out


def decoder_from_torch(sd, prefix=""):
    p = {}
    if prefix + "upsample.0.weight" in sd:
        perm = _nhwc_to_nchw_perm()
        inv = np.argsort(perm)
        w = np.asarray(sd[prefix + "upsample.0.weight"])
        p["upsample"] = {"kernel": w.T[:, inv],
                         "bias": np.asarray(sd[prefix + "upsample.0.bias"])[inv]}
        for fl, th in _DEC_DECONV:
            p[fl] = {"kernel": _deconv_bwd(sd[prefix + th + ".weight"])}
        for fl, th in _DEC_BN:
            p[fl] = {"scale": np.asarray(sd[prefix + th + ".weight"]),
                     "bias": np.asarray(sd[prefix + th + ".bias"])}
    else:
        net = {}
        j = 0
        while prefix + f"deconv_net.{2 * j}.weight" in sd:
            net[f"linear_{j}"] = {
                "kernel": _lin_bwd(sd[prefix + f"deconv_net.{2 * j}.weight"]),
                "bias": np.asarray(sd[prefix + f"deconv_net.{2 * j}.bias"])}
            j += 1
        p["deconv_net"] = net
    return p


# --- models ------------------------------------------------------------------

def vae_to_torch(params):
    out = {}
    out.update(encoder_to_torch(params["encoder"], "encoder."))
    out.update(decoder_to_torch(params["decoder"], "decoder."))
    return out


def vae_from_torch(sd):
    return {"encoder": encoder_from_torch(sd, "encoder."),
            "decoder": decoder_from_torch(sd, "decoder.")}


def mvae_to_torch(params):
    out = {}
    for name in ("visual_encoder", "tactile_encoder", "pose_encoder"):
        if name in params:
            out.update(encoder_to_torch(params[name], name + "."))
    for name in ("visual_decoder", "tactile_decoder", "pose_decoder"):
        if name in params:
            out.update(decoder_to_torch(params[name], name + "."))
    return out


def mvae_from_torch(sd):
    p = {}
    for name in ("visual_encoder", "tactile_encoder", "pose_encoder"):
        if any(k.startswith(name + ".") for k in sd):
            p[name] = encoder_from_torch(sd, name + ".")
    for name in ("visual_decoder", "tactile_decoder", "pose_decoder"):
        if any(k.startswith(name + ".") for k in sd):
            p[name] = decoder_from_torch(sd, name + ".")
    return p


_REG_OUT = [("out_0", "out_net.0"), ("out_1", "out_net.2"), ("out_2", "out_net.4")]


def regressor_to_torch(params):
    out = {}
    for fl, th in _ENC_CONV:
        out[th + ".weight"] = _conv_fwd(params[fl]["kernel"])
    for fl, th in _ENC_BN:
        _bn_export(out, th, params[fl])
    perm = _nhwc_to_nchw_perm()
    fk = np.asarray(params["fc"]["kernel"])
    out["fc_net.0.weight"] = fk[perm].T
    out["fc_net.0.bias"] = np.asarray(params["fc"]["bias"])
    for fl, th in _REG_OUT:
        out[th + ".weight"] = _lin_fwd(params[fl]["kernel"])
        out[th + ".bias"] = np.asarray(params[fl]["bias"])
    return out


def regressor_from_torch(sd):
    p = {}
    for fl, th in _ENC_CONV:
        p[fl] = {"kernel": _conv_bwd(sd[th + ".weight"])}
    for fl, th in _ENC_BN:
        p[fl] = {"scale": np.asarray(sd[th + ".weight"]),
                 "bias": np.asarray(sd[th + ".bias"])}
    perm = _nhwc_to_nchw_perm()
    inv = np.argsort(perm)
    w = np.asarray(sd["fc_net.0.weight"])
    p["fc"] = {"kernel": w.T[inv], "bias": np.asarray(sd["fc_net.0.bias"])}
    for fl, th in _REG_OUT:
        p[fl] = {"kernel": _lin_bwd(sd[th + ".weight"]),
                 "bias": np.asarray(sd[th + ".bias"])}
    return p


def to_torch_state_dict(model_name, params):
    if "mvae" in model_name:
        return mvae_to_torch(params)
    if "vae" in model_name:
        return vae_to_torch(params)
    return regressor_to_torch(params)


def from_torch_state_dict(model_name, sd):
    if "mvae" in model_name:
        return mvae_from_torch(sd)
    if "vae" in model_name:
        return vae_from_torch(sd)
    return regressor_from_torch(sd)
