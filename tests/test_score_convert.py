"""SPM ScoreDecoder checkpoint-conversion parity against a reference-exact
torch oracle (lib/models/mixformer_cvt/score_decoder.py:12-66 + head.py MLP).

The PrRoI pooling itself is oracle-tested in tests/test_prroi.py; here the
torch oracle consumes the SAME pooled box feature as our module (computed by
ops/prroi.prroi_pool) so the test isolates the score branch's attention /
projection / LayerNorm / MLP conversion — the part map_torch_key handles via
`score_branch.*` (utils/torch_convert.py _map_score_key).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import flax.linen as fnn  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from multi_modal_tracking_tpu.models.score_decoder import ScoreDecoder  # noqa: E402
from multi_modal_tracking_tpu.ops.prroi import prroi_pool  # noqa: E402
from multi_modal_tracking_tpu.utils.torch_convert import convert_state_dict  # noqa: E402

DIM, NH, POOL, NLAYER = 48, 4, 4, 3
B, HS, HT = 2, 6, 4


class _MLP(nn.Module):
    """head.py:215-232 MLP (BN=False)."""

    def __init__(self, input_dim, hidden_dim, output_dim, num_layers):
        super().__init__()
        self.num_layers = num_layers
        h = [hidden_dim] * (num_layers - 1)
        self.layers = nn.ModuleList(nn.Linear(n, k)
                                    for n, k in zip([input_dim] + h, h + [output_dim]))

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = F.relu(layer(x)) if i < self.num_layers - 1 else layer(x)
        return x


class _ScoreDecoder(nn.Module):
    """score_decoder.py:12-66 with the pooled box feature injected (the CUDA
    PrRoIPool is replaced by ops/prroi, itself oracle-tested)."""

    def __init__(self):
        super().__init__()
        self.num_heads = NH
        self.score_head = _MLP(DIM, DIM, 1, NLAYER)
        self.scale = DIM ** -0.5
        self.proj_q = nn.ModuleList(nn.Linear(DIM, DIM) for _ in range(2))
        self.proj_k = nn.ModuleList(nn.Linear(DIM, DIM) for _ in range(2))
        self.proj_v = nn.ModuleList(nn.Linear(DIM, DIM) for _ in range(2))
        self.proj = nn.ModuleList(nn.Linear(DIM, DIM) for _ in range(2))
        self.norm1 = nn.LayerNorm(DIM)
        self.norm2 = nn.ModuleList(nn.LayerNorm(DIM) for _ in range(2))
        self.score_token = nn.Parameter(torch.zeros(1, 1, DIM))
        nn.init.trunc_normal_(self.score_token, std=0.02)

    def forward(self, search_box_feat, template_feat):
        b = search_box_feat.shape[0]
        x = self.score_token.expand(b, -1, -1)
        x = self.norm1(x)
        kv_memory = [search_box_feat, template_feat]
        for i in range(2):
            def heads(t):
                bb, tt, _ = t.shape
                return t.view(bb, tt, self.num_heads, -1).permute(0, 2, 1, 3)
            q = heads(self.proj_q[i](x))
            k = heads(self.proj_k[i](kv_memory[i]))
            v = heads(self.proj_v[i](kv_memory[i]))
            attn = torch.einsum("bhlk,bhtk->bhlt", q, k) * self.scale
            attn = F.softmax(attn, dim=-1)
            x = torch.einsum("bhlt,bhtv->bhlv", attn, v)
            x = x.permute(0, 2, 1, 3).reshape(b, 1, DIM)
            x = self.proj[i](x)
            x = self.norm2[i](x)
        return self.score_head(x)


class _Wrap(fnn.Module):
    """Names the decoder `score_branch` so map_torch_key's prefix applies."""

    @fnn.compact
    def __call__(self, search_feat, template_feat, search_box):
        return ScoreDecoder(num_heads=NH, hidden_dim=DIM, nlayer_head=NLAYER,
                            pool_size=POOL, name="score_branch")(
            search_feat, template_feat, search_box)


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    oracle = _ScoreDecoder().eval()
    sd = {f"score_branch.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}

    rng = np.random.default_rng(0)
    search_feat = rng.normal(size=(B, HS, HS, DIM)).astype(np.float32)
    template_feat = rng.normal(size=(B, HT, HT, DIM)).astype(np.float32)
    # xyxy in [0,1], well inside the map
    box = np.stack([[0.15, 0.2, 0.7, 0.8], [0.05, 0.1, 0.5, 0.9]]).astype(np.float32)

    model = _Wrap()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(search_feat),
                           jnp.asarray(template_feat), jnp.asarray(box))
    variables = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32),
                                       variables)
    variables, report = convert_state_dict(sd, variables, strict=True,
                                           verbose=False)
    return oracle, sd, model, variables, (search_feat, template_feat, box)


def test_every_score_key_maps(converted):
    _, sd, _, _, _ = converted
    # strict=True in the fixture already guarantees it; keep the count honest
    # token(1) + norm1(2) + q/k/v 3x2 linears (12) + proj 2 (4) + norm2 2 (4)
    # + MLP 3 linears (6)
    assert len(sd) == 1 + 2 + 12 + 4 + 4 + NLAYER * 2


def test_score_logits_match_oracle(converted):
    oracle, _, model, variables, (search_feat, template_feat, box) = converted

    # our module pools internally from the full search feature map
    ours = model.apply(variables, jnp.asarray(search_feat),
                       jnp.asarray(template_feat), jnp.asarray(box))

    # feed the oracle the same pooled feature (NHWC -> (B, P*P, C))
    rois = np.concatenate([np.arange(B, dtype=np.float32)[:, None],
                           box * HS], axis=1)
    pooled = prroi_pool(jnp.asarray(search_feat), jnp.asarray(rois),
                        POOL, POOL, 1.0)
    pooled = np.asarray(pooled).reshape(B, POOL * POOL, DIM)
    tmpl = template_feat.reshape(B, HT * HT, DIM)
    with torch.inference_mode():
        want = oracle(torch.tensor(pooled, dtype=torch.float32),
                      torch.tensor(tmpl, dtype=torch.float32)).numpy()

    np.testing.assert_allclose(np.asarray(ours), want.reshape(np.asarray(ours).shape),
                               rtol=2e-5, atol=2e-6)
