"""Conversion parity for Attention_Fusion_Bimodal_LNSpecific — the fusion
class of the reference's SHIPPED flagship recipe
(experiments/asymmetric_shared_ce/attention_lasher_newfusion_2layer.yaml:
FUSION_CLASS "Attention_Fusion_Bimodal_LNSpecific", FUSION_LAYERS 2).

Structure (fusion_utils.py:243-279): separate adjust_v / adjust_i 1x1
conv+GN in-projections, the LN-specific deformable encoder, then adjust_cat
over the CONCATENATED modal outputs — vs the _2 variant's shared adjust_in
and summed outputs already covered by tests/test_flagship_convert.py, whose
torch encoder/MSDA oracles are reused here.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn as nn  # noqa: E402

from tests.test_flagship_convert import D_BB, D_F, GS, _FusionAttention  # noqa: E402

from multi_modal_tracking_tpu.models.fusion import build_fusion  # noqa: E402
from multi_modal_tracking_tpu.utils.torch_convert import convert_state_dict  # noqa: E402

B = 2


class _FusionLNSpecific(nn.Module):
    """Attention_Fusion_Bimodal_LNSpecific (fusion_utils.py:243-279)."""

    def __init__(self):
        super().__init__()
        self.adjust_v = nn.Sequential(nn.Conv2d(D_BB, D_F, 1), nn.GroupNorm(32, D_F))
        self.adjust_i = nn.Sequential(nn.Conv2d(D_BB, D_F, 1), nn.GroupNorm(32, D_F))
        self.fusion_attention = _FusionAttention()
        self.adjust_cat = nn.Sequential(nn.Conv2d(2 * D_F, D_BB, 1),
                                        nn.GroupNorm(32, D_BB))

    def forward(self, in_v, in_i):
        b, c, h, w = in_v.shape
        out = self.fusion_attention(self.adjust_v(in_v), self.adjust_i(in_i))
        out_v, out_i = torch.chunk(out, 2, 1)
        out_v = out_v.permute(0, 2, 1).view(b, -1, h, w).contiguous()
        out_i = out_i.permute(0, 2, 1).view(b, -1, h, w).contiguous()
        return self.adjust_cat(torch.cat([out_v, out_i], dim=1))


def test_lnspecific_cat_fusion_matches_oracle():
    torch.manual_seed(0)
    oracle = _FusionLNSpecific().eval()
    sd = {f"fusion_vi.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}

    model = build_fusion("Attention_Fusion_Bimodal_LNSpecific", channels=D_BB,
                         d_model=D_F, num_encoder_layers=2)
    rng = np.random.default_rng(0)
    xv = rng.normal(size=(B, GS, GS, D_BB)).astype(np.float32)
    xi = rng.normal(size=(B, GS, GS, D_BB)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(xv), jnp.asarray(xi))
    # nest under fusion_vi to match the state-dict prefix
    variables = {"params": {"fusion_vi": variables["params"]}}
    variables, report = convert_state_dict(sd, variables, strict=True,
                                           verbose=False)

    ours = model.apply({"params": variables["params"]["fusion_vi"]},
                       jnp.asarray(xv), jnp.asarray(xi))
    with torch.inference_mode():
        want = oracle(torch.tensor(xv).permute(0, 3, 1, 2),
                      torch.tensor(xi).permute(0, 3, 1, 2)).numpy()
    want = np.transpose(want, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), want, rtol=5e-4, atol=5e-5)
