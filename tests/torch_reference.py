"""A torch 'golden model' of the reference MVAE semantics, written fresh for
testing cross-framework parity (architecture per SURVEY.md section 2.1 /
mmdyn/pytorch/models/vae.py docs — not copied code).

Includes utilities to transplant mmdyn_tpu flax parameters into the torch
modules so both frameworks compute with identical weights.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class GoldSwish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


class GoldEncoder(nn.Module):
    def __init__(self, latent_size, dropout=False, condition_dim=0):
        super().__init__()
        self.conv_net = nn.Sequential(
            nn.Conv2d(3, 32, 4, 2, 1, bias=False), GoldSwish(),
            nn.Conv2d(32, 64, 4, 2, 1, bias=False), nn.BatchNorm2d(64), GoldSwish(),
            nn.Conv2d(64, 128, 4, 2, 1, bias=False), nn.BatchNorm2d(128), GoldSwish(),
            nn.Conv2d(128, 256, 4, 1, 0, bias=False), nn.BatchNorm2d(256), GoldSwish(),
        )
        self.fc = nn.Linear(256 * 5 * 5, 512)
        # dropout off by default (deterministic golden-value parity tests);
        # the trajectory harness turns it on to match the reference's
        # Dropout(0.1) (vae.py:207) symmetrically
        self.drop = nn.Dropout(0.1) if dropout else nn.Identity()
        # conditional (CVAE) pathway: the shock vector concatenates between
        # the FC trunk and the heads (vae.py:195-196, :231-237)
        self.linear_means = nn.Linear(512 + condition_dim, latent_size)
        self.linear_log_var = nn.Linear(512 + condition_dim, latent_size)

    def forward(self, x, c=None):
        h = self.conv_net(x)
        h = h.reshape(h.size(0), -1)
        h = self.fc(h)
        h = h * torch.sigmoid(h)
        h = self.drop(h)
        if c is not None:
            h = torch.cat((h, c.float()), dim=-1)
        return self.linear_means(h), self.linear_log_var(h)


class GoldDecoder(nn.Module):
    def __init__(self, latent_size, condition_dim=0):
        super().__init__()
        # conditional: condition concatenates to z (vae.py:259, :285-291)
        self.upsample = nn.Linear(latent_size + condition_dim, 256 * 5 * 5)
        self.hallucinate = nn.Sequential(
            nn.ConvTranspose2d(256, 128, 4, 1, 0, bias=False), nn.BatchNorm2d(128), GoldSwish(),
            nn.ConvTranspose2d(128, 64, 4, 2, 1, bias=False), nn.BatchNorm2d(64), GoldSwish(),
            nn.ConvTranspose2d(64, 32, 4, 2, 1, bias=False), nn.BatchNorm2d(32), GoldSwish(),
            nn.ConvTranspose2d(32, 3, 4, 2, 1, bias=False),
        )

    def forward(self, z, c=None):
        if c is not None:
            z = torch.cat((z, c.float()), dim=-1)
        h = self.upsample(z)
        h = h * torch.sigmoid(h)
        return self.hallucinate(h.reshape(-1, 256, 5, 5))


class GoldMlp(nn.Module):
    """Linear->ReLU stack with identity output (vae.py:14-19 semantics)."""

    def __init__(self, sizes):
        super().__init__()
        layers = []
        for j in range(len(sizes) - 1):
            layers.append(nn.Linear(sizes[j], sizes[j + 1]))
            if j < len(sizes) - 2:
                layers.append(nn.ReLU())
        self.net = nn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


class GoldPoseEncoder(nn.Module):
    def __init__(self, latent_size):
        super().__init__()
        self.fc_net = GoldMlp([7, 512, 512])
        self.linear_means = nn.Linear(512, latent_size)
        self.linear_log_var = nn.Linear(512, latent_size)

    def forward(self, pose):
        h = self.fc_net(pose)
        return self.linear_means(h), self.linear_log_var(h)


def gold_poe(mu, logvar, eps=1e-8):
    var = torch.exp(logvar) + eps
    T = 1.0 / (var + eps)
    pd_mu = torch.sum(mu * T, dim=0) / torch.sum(T, dim=0)
    pd_var = 1.0 / torch.sum(T, dim=0)
    return pd_mu, torch.log(pd_var + eps)


class GoldMVAE(nn.Module):
    """Reference-semantics MVAE; z = posterior mean (noise-free parity)."""

    def __init__(self, latent_size, use_pose, dropout=False, condition_dim=0):
        super().__init__()
        self.latent_size = latent_size
        self.use_pose = use_pose
        self.visual_encoder = GoldEncoder(latent_size, dropout=dropout,
                                          condition_dim=condition_dim)
        self.visual_decoder = GoldDecoder(latent_size,
                                          condition_dim=condition_dim)
        self.tactile_encoder = GoldEncoder(latent_size, dropout=dropout,
                                           condition_dim=condition_dim)
        self.tactile_decoder = GoldDecoder(latent_size,
                                           condition_dim=condition_dim)
        if use_pose:
            # pose pathway is unconditional in the reference (Encoder is
            # constructed without conditional=True, vae.py:118-123)
            self.pose_encoder = GoldPoseEncoder(latent_size)
            self.pose_decoder = GoldMlp([latent_size, 512, 512, 7])

    def forward(self, visual, tactile, pose=None, condition=None):
        present = [m for m in (visual, tactile, pose) if m is not None]
        b = present[0].size(0)
        mus = [torch.zeros(1, b, self.latent_size)]
        lvs = [torch.zeros(1, b, self.latent_size)]
        if visual is not None:
            mu, lv = self.visual_encoder(visual, condition)
            mus.append(mu[None]); lvs.append(lv[None])
        if tactile is not None:
            mu, lv = self.tactile_encoder(tactile, condition)
            mus.append(mu[None]); lvs.append(lv[None])
        if pose is not None and self.use_pose:
            mu, lv = self.pose_encoder(pose)
            mus.append(mu[None]); lvs.append(lv[None])
        mu, lv = gold_poe(torch.cat(mus), torch.cat(lvs))
        z = mu  # noise-free
        vr = self.visual_decoder(z, condition)
        tr = self.tactile_decoder(z, condition)
        pr = self.pose_decoder(z) if self.use_pose else None
        return vr, tr, pr, mu, lv


def gold_mvae_elbo(recons, xs, mu, logvar, kl_weight, pose_multiplier):
    """problems.py:421-458 semantics."""
    b = xs[0].size(0)
    kld = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp())
    err = 0.0
    for r, x in zip(recons, xs):
        if r.dim() > 2:
            err = err + F.binary_cross_entropy_with_logits(
                r.reshape(x.shape), x, reduction="sum")
        else:
            err = err + pose_multiplier * F.mse_loss(r, x, reduction="sum")
    return (err + kl_weight * kld) / b


def gold_mvae_evaluate(model, xv, xt, xp, kl_weight, pose_multiplier):
    """The reference 3-/7-pass subset evaluation (problems.py:473-529)."""
    vr, tr, _, mu, lv = model(xv, xt, None)
    loss = gold_mvae_elbo([vr, tr], [xv, xt], mu, lv, kl_weight, pose_multiplier)
    vr1, _, _, mu, lv = model(xv, None, None)
    loss = loss + gold_mvae_elbo([vr1], [xv], mu, lv, kl_weight, pose_multiplier)
    _, tr1, _, mu, lv = model(None, xt, None)
    loss = loss + gold_mvae_elbo([tr1], [xt], mu, lv, kl_weight, pose_multiplier)
    if model.use_pose:
        vrj, trj, prj, mu, lv = model(xv, xt, xp)
        loss = loss + gold_mvae_elbo([vrj, trj, prj], [xv, xt, xp], mu, lv,
                                     kl_weight, pose_multiplier)
        vr2, _, pr2, mu, lv = model(xv, None, xp)
        loss = loss + gold_mvae_elbo([vr2, pr2], [xv, xp], mu, lv,
                                     kl_weight, pose_multiplier)
        _, tr2, pr3, mu, lv = model(None, xt, xp)
        loss = loss + gold_mvae_elbo([tr2, pr3], [xt, xp], mu, lv,
                                     kl_weight, pose_multiplier)
        _, _, pr4, mu, lv = model(None, None, xp)
        loss = loss + gold_mvae_elbo([pr4], [xp], mu, lv,
                                     kl_weight, pose_multiplier)
    return loss


class GoldRegressor(nn.Module):
    """Reference-semantics CNN pose regressor (models.py:28-77): the encoder
    conv trunk, FC 6400 -> 512 + Swish (+ Dropout), MLP 512 -> 256 -> 256 ->
    out_dim with ReLU between."""

    def __init__(self, out_dim=7, dropout=False):
        super().__init__()
        self.conv_net = nn.Sequential(
            nn.Conv2d(3, 32, 4, 2, 1, bias=False), GoldSwish(),
            nn.Conv2d(32, 64, 4, 2, 1, bias=False), nn.BatchNorm2d(64), GoldSwish(),
            nn.Conv2d(64, 128, 4, 2, 1, bias=False), nn.BatchNorm2d(128), GoldSwish(),
            nn.Conv2d(128, 256, 4, 1, 0, bias=False), nn.BatchNorm2d(256), GoldSwish(),
        )
        self.fc = nn.Linear(256 * 5 * 5, 512)
        self.drop = nn.Dropout(0.1) if dropout else nn.Identity()
        self.head = nn.Sequential(
            nn.Linear(512, 256), nn.ReLU(),
            nn.Linear(256, 256), nn.ReLU(),
            nn.Linear(256, out_dim),
        )

    def forward(self, x):
        h = self.conv_net(x)
        h = h.reshape(h.size(0), -1)
        h = self.fc(h)
        h = h * torch.sigmoid(h)
        return self.head(self.drop(h))


def load_regressor(gold: GoldRegressor, p):
    """Transplant mmdyn_tpu Regressor params into the torch golden model."""
    conv_layers = [m for m in gold.conv_net if isinstance(m, nn.Conv2d)]
    bn_layers = [m for m in gold.conv_net if isinstance(m, nn.BatchNorm2d)]
    with torch.no_grad():
        for i, conv in enumerate(conv_layers):
            k = np.asarray(p[f"conv_{i}"]["kernel"])
            conv.weight.copy_(torch.tensor(k.transpose(3, 2, 0, 1)))
        for i, bn in enumerate(bn_layers):
            bnp = p[f"bn_{i+1}"]
            bn.weight.copy_(torch.tensor(np.asarray(bnp["scale"])))
            bn.bias.copy_(torch.tensor(np.asarray(bnp["bias"])))
        fk = np.asarray(p["fc"]["kernel"])
        perm = _nhwc_to_nchw_fc_perm()
        gold.fc.weight.copy_(torch.tensor(fk[perm].T))
        gold.fc.bias.copy_(torch.tensor(np.asarray(p["fc"]["bias"])))
        lins = [m for m in gold.head if isinstance(m, nn.Linear)]
        for j, lin in enumerate(lins):
            lp = p[f"out_{j}"]
            lin.weight.copy_(torch.tensor(np.asarray(lp["kernel"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(lp["bias"])))


# ---------------------------------------------------------------------------
# flax -> torch weight transplant
# ---------------------------------------------------------------------------

def _nhwc_to_nchw_fc_perm(h=5, w=5, c=256):
    """Index map: flax fc input (NHWC flatten) -> torch fc input (NCHW flatten)."""
    idx = np.arange(h * w * c).reshape(h, w, c).transpose(2, 0, 1).reshape(-1)
    return idx


def load_encoder(gold: GoldEncoder, p):
    conv_layers = [m for m in gold.conv_net if isinstance(m, nn.Conv2d)]
    bn_layers = [m for m in gold.conv_net if isinstance(m, nn.BatchNorm2d)]
    with torch.no_grad():
        for i, conv in enumerate(conv_layers):
            k = np.asarray(p[f"conv_{i}"]["kernel"])  # (kh,kw,in,out)
            conv.weight.copy_(torch.tensor(k.transpose(3, 2, 0, 1)))
        for i, bn in enumerate(bn_layers):
            bnp = p[f"bn_{i+1}"]
            bn.weight.copy_(torch.tensor(np.asarray(bnp["scale"])))
            bn.bias.copy_(torch.tensor(np.asarray(bnp["bias"])))
        fk = np.asarray(p["fc"]["kernel"])  # (6400_nhwc, 512)
        perm = _nhwc_to_nchw_fc_perm()
        # torch fc weight (512, 6400_nchw); nchw row j reads flax row perm[j]
        gold.fc.weight.copy_(torch.tensor(fk[perm].T))
        gold.fc.bias.copy_(torch.tensor(np.asarray(p["fc"]["bias"])))
        for name, lin in (("linear_means", gold.linear_means),
                          ("linear_log_var", gold.linear_log_var)):
            lin.weight.copy_(torch.tensor(np.asarray(p[name]["kernel"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(p[name]["bias"])))


def load_decoder(gold: GoldDecoder, p):
    deconv_layers = [m for m in gold.hallucinate if isinstance(m, nn.ConvTranspose2d)]
    bn_layers = [m for m in gold.hallucinate if isinstance(m, nn.BatchNorm2d)]
    with torch.no_grad():
        uk = np.asarray(p["upsample"]["kernel"])  # (latent, 6400_nhwc)
        perm = _nhwc_to_nchw_fc_perm()
        # torch upsample output col j (nchw) = flax col perm[j]
        gold.upsample.weight.copy_(torch.tensor(uk[:, perm].T))
        gold.upsample.bias.copy_(
            torch.tensor(np.asarray(p["upsample"]["bias"])[perm]))
        for i, dc in enumerate(deconv_layers):
            k = np.asarray(p[f"deconv_{i}"]["kernel"])  # (kh,kw,in,out)
            # torch ConvT weight (in, out, kh, kw) with spatial flip
            dc.weight.copy_(torch.tensor(k[::-1, ::-1].copy().transpose(2, 3, 0, 1)))
        for i, bn in enumerate(bn_layers):
            bnp = p[f"bn_{i}"]
            bn.weight.copy_(torch.tensor(np.asarray(bnp["scale"])))
            bn.bias.copy_(torch.tensor(np.asarray(bnp["bias"])))


def load_mlp(gold: GoldMlp, p):
    lins = [m for m in gold.net if isinstance(m, nn.Linear)]
    with torch.no_grad():
        for j, lin in enumerate(lins):
            lp = p[f"linear_{j}"]
            lin.weight.copy_(torch.tensor(np.asarray(lp["kernel"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(lp["bias"])))


def load_pose_encoder(gold: GoldPoseEncoder, p):
    load_mlp(gold.fc_net, p["fc_net"])
    with torch.no_grad():
        for name, lin in (("linear_means", gold.linear_means),
                          ("linear_log_var", gold.linear_log_var)):
            lin.weight.copy_(torch.tensor(np.asarray(p[name]["kernel"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(p[name]["bias"])))


def load_mvae(gold: GoldMVAE, params):
    load_encoder(gold.visual_encoder, params["visual_encoder"])
    load_decoder(gold.visual_decoder, params["visual_decoder"])
    load_encoder(gold.tactile_encoder, params["tactile_encoder"])
    load_decoder(gold.tactile_decoder, params["tactile_decoder"])
    if gold.use_pose:
        load_pose_encoder(gold.pose_encoder, params["pose_encoder"])
        load_mlp(gold.pose_decoder, params["pose_decoder"]["deconv_net"])
