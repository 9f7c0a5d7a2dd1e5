"""Validate the torch->flax ResNet conversion (and thereby the Flax ResNet
encoder's exact parity with torchvision) using RANDOM torch weights."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
torchvision = pytest.importorskip("torchvision")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from convert_bts_encoder import convert_resnet_state_dict  # noqa: E402

from dualpixelface_tpu.models.bts.encoder import ResNetEncoder  # noqa: E402


def test_resnet50_forward_parity():
    tmodel = torchvision.models.resnet50(weights=None)
    tmodel.eval()

    params, stats = convert_resnet_state_dict(tmodel.state_dict(), (3, 4, 6, 3))

    fmodel = ResNetEncoder("resnet50_bts")
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    init_vars = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # structural match check
    init_keys = set(init_vars["params"].keys())
    conv_keys = set(params.keys())
    assert init_keys == conv_keys, init_keys ^ conv_keys

    skips = fmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )

    with torch.no_grad():
        t = torch.from_numpy(np.moveaxis(x, -1, 1))
        y = tmodel.conv1(t)
        y = tmodel.relu(tmodel.bn1(y))
        relu_feat = y
        y = tmodel.maxpool(y)
        l1 = tmodel.layer1(y)
        l2 = tmodel.layer2(l1)
        l3 = tmodel.layer3(l2)
        l4 = tmodel.layer4(l3)

    for ours, ref in [
        (skips[1], relu_feat),
        (skips[2], l1),
        (skips[3], l2),
        (skips[4], l3),
        (skips[5], l4),
    ]:
        np.testing.assert_allclose(
            np.asarray(ours),
            np.moveaxis(ref.numpy(), 1, -1),
            rtol=1e-3, atol=1e-3,
        )
