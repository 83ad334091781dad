"""Harness to run the reference PyTorch model (/root/reference) on CPU for
golden end-to-end parity tests.

The reference is CUDA-only as shipped; three shims make it run on CPU:
  * a minimal `timm.models.layers` stub (DropPath / to_2tuple /
    trunc_normal_ -- public timm API, reimplemented here, not vendored);
  * a `selective_scan_cuda` stub implementing the extension's `fwd` ABI
    (`selective_scan/selective_scan.cpp:494-497`) with a plain torch
    recurrence (forward only -- parity tests are eval-mode);
  * `Tensor.cuda` no-op'd (LDC hardcodes `.cuda()` -- `models/cross.py:800`).

Import this module BEFORE importing anything from /root/reference.
"""
from __future__ import annotations

import importlib.machinery
import os
import sys
import types


def _mk_module(name: str) -> types.ModuleType:
    """Stub module with a real __spec__ (transformers probes
    importlib.util.find_spec('timm'), which raises on spec-less stubs)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


def install_reference_shims():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    if "timm" not in sys.modules:
        timm = _mk_module("timm")
        timm_models = _mk_module("timm.models")
        timm_layers = _mk_module("timm.models.layers")

        class DropPath(nn.Module):
            def __init__(self, drop_prob=0.0, scale_by_keep=True):
                super().__init__()
                self.drop_prob = drop_prob
                self.scale_by_keep = scale_by_keep

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = x.new_empty(shape).bernoulli_(keep)
                return x * mask / keep if self.scale_by_keep else x * mask

        def to_2tuple(v):
            return v if isinstance(v, tuple) else (v, v)

        def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                t.normal_(mean, std).clamp_(a, b)
            return t

        timm_layers.DropPath = DropPath
        timm_layers.to_2tuple = to_2tuple
        timm_layers.trunc_normal_ = trunc_normal_
        timm_models.layers = timm_layers
        timm.models = timm_models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers

    if "selective_scan_cuda" not in sys.modules:
        ssc = _mk_module("selective_scan_cuda")

        def fwd(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                delta_softplus=False):
            """CPU torch implementation of the extension ABI: u/delta
            (B, D, L); A (D, N); B/C (B, G, N, L) *grouped* -- group g
            serves channels [g*D/G, (g+1)*D/G) (the fusion model folds its
            K=4 directions into G, `models/cross.py:312-326`); D (D,);
            returns [out, x_carry]. x_carry is only consumed by the
            backward, which this eval-only stub does not serve."""
            u = u.float()
            delta = delta.float()
            if delta_bias is not None:
                delta = delta + delta_bias.float()[None, :, None]
            if delta_softplus:
                delta = F.softplus(delta)
            Bb, Dch, L = u.shape
            G = B.shape[1]
            N = A.shape[-1]
            Dg = Dch // G
            outs, states = [], []
            for g in range(G):
                sl = slice(g * Dg, (g + 1) * Dg)
                ug, dg = u[:, sl], delta[:, sl]
                Ag = A.float()[sl]
                Bv = B.float()[:, g]      # (B, N, L)
                Cv = C.float()[:, g]
                dA = torch.exp(dg.unsqueeze(-1)
                               * Ag[None, :, None, :])   # (B, Dg, L, N)
                dBu = dg.unsqueeze(-1) * Bv.permute(0, 2, 1)[:, None] \
                    * ug.unsqueeze(-1)
                x = ug.new_zeros(Bb, Dg, N)
                ys = []
                for t in range(L):
                    x = dA[:, :, t] * x + dBu[:, :, t]
                    ys.append(torch.einsum("bdn,bn->bd", x, Cv[:, :, t]))
                outs.append(torch.stack(ys, dim=-1))
                states.append(x)
            out = torch.cat(outs, dim=1)
            if D is not None:
                out = out + u * D.float()[None, :, None]
            if z is not None:
                out = out * F.silu(z.float())
            return [out, torch.cat(states, dim=1)]

        def bwd(u, delta, A, B, C, D, z, delta_bias, dout, x, out, dz,
                delta_softplus, recompute_out_z=False):
            """Extension bwd ABI (`selective_scan.cpp:489-492`, called from
            `models/cross.py:123-133`) via torch-autograd replay of the fwd
            recurrence: exact CPU gradients for full-model grad-parity
            tests. z/out_z paths are unused by the fusion model's binding
            (it always passes z=None)."""
            assert z is None and dz is None, "z-fused path not exercised"
            leaves = [t.detach().clone().requires_grad_(True)
                      if t is not None else None
                      for t in (u, delta, A, B, C, D, delta_bias)]
            with torch.enable_grad():
                o, _ = fwd(leaves[0], leaves[1], leaves[2], leaves[3],
                           leaves[4], leaves[5], None, leaves[6],
                           delta_softplus)
                live = [t for t in leaves if t is not None]
                grads = iter(torch.autograd.grad(o, live, dout))
            full = [next(grads) if t is not None else None for t in leaves]
            du, ddelta, dA, dB, dC, dD, ddb = full
            if dD is None:
                dD = torch.zeros_like(D) if D is not None else None
            if ddb is None and delta_bias is not None:
                ddb = torch.zeros_like(delta_bias)
            return [du, ddelta, dA, dB, dC, dD, ddb]

        ssc.fwd = fwd
        ssc.bwd = bwd
        sys.modules["selective_scan_cuda"] = ssc

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # LDC `.cuda()` taps
        torch.nn.Module.cuda = lambda self, *a, **k: self

    if REFERENCE_ROOT not in sys.path:
        # APPEND, never prepend: the reference tree has top-level modules
        # (train, test, utils, loss) that would shadow this repo's CLIs for
        # every later `import train` in the same process (seen as a real
        # full-suite failure in test_train.py::test_train_cli_mesh_flag).
        sys.path.append(REFERENCE_ROOT)


def build_reference_fusion(depths, depths_decoder, dims, d_state,
                           seed: int = 0):
    """Instantiate the reference VSSM_Fusion on CPU in eval mode."""
    install_reference_shims()
    import torch

    torch.manual_seed(seed)
    from models.vmamba_Fusion_efficross import VSSM_Fusion

    model = VSSM_Fusion(depths=list(depths),
                        depths_decoder=list(depths_decoder),
                        dims=list(dims),
                        dims_decoder=list(reversed(dims)),  # default is the
                        # full-size [768,384,192,96] regardless of dims
                        d_state=d_state)
    model.eval()
    return model
