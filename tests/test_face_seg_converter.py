"""Validate the face_seg torch->flax weight conversion (and thereby the Flax
BiSeNet's parity with the reference face parser) using RANDOM torch weights.

The reference copy imports stale `Module.External.FaceMasking` paths
(ref src/module/face_seg/model.py:10), so we register an import shim that
maps that package to the reference files before loading.
"""
import importlib.util
import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

REF = Path("/root/reference/src/module/face_seg")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from convert_face_seg_weights import convert_face_seg_state_dict  # noqa: E402

from dualpixelface_tpu.models.face_seg.model import BiSeNet  # noqa: E402


def _load_ref_bisenet():
    """Load the reference BiSeNet class, shimming its stale package imports."""

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    for pkg in ("Module", "Module.External", "Module.External.FaceMasking"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    # ref model.py imports torchvision (unused by BiSeNet); stub if absent
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    resnet_mod = _load("Module.External.FaceMasking.resnet", REF / "resnet.py")
    sys.modules["Module.External.FaceMasking"].resnet = resnet_mod
    model_mod = _load("Module.External.FaceMasking.model", REF / "model.py")
    return model_mod.BiSeNet


def test_face_seg_forward_parity():
    RefBiSeNet = _load_ref_bisenet()
    tmodel = RefBiSeNet(n_classes=19)
    tmodel.eval()
    # give BN non-trivial running stats so eval-mode parity is meaningful
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.4)

    sd = tmodel.state_dict()
    params, stats = convert_face_seg_state_dict(sd)

    fmodel = BiSeNet(n_classes=19)
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    init_vars = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ref_shapes = jax.tree_util.tree_map(lambda v: v.shape, init_vars)
    got_shapes = jax.tree_util.tree_map(
        lambda v: v.shape, {"params": params, "batch_stats": stats}
    )
    assert ref_shapes == got_shapes

    out, out16, out32 = fmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )

    with torch.no_grad():
        t_out, t_out16, t_out32 = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1)))

    for ours, ref in [(out, t_out), (out16, t_out16), (out32, t_out32)]:
        np.testing.assert_allclose(
            np.asarray(ours),
            np.moveaxis(ref.numpy(), 1, -1),
            rtol=2e-3, atol=2e-3,
        )


def test_face_mask_estimator_restores_converted_checkpoint(tmp_path):
    """End-to-end wiring: convert random ref weights -> Orbax -> FaceMaskEstimator."""
    RefBiSeNet = _load_ref_bisenet()
    tmodel = RefBiSeNet(n_classes=19)
    tmodel.eval()
    params, stats = convert_face_seg_state_dict(tmodel.state_dict())

    import orbax.checkpoint as ocp

    ckpt_dir = tmp_path / "face_seg_ckpt"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt_dir.absolute(), {"params": params, "batch_stats": stats})

    from dualpixelface_tpu.models.face_seg.evaluate import FaceMaskEstimator

    est = FaceMaskEstimator(checkpoint=str(ckpt_dir), size=64)
    # restored tree must match the converted weights, not the scratch init
    got = np.asarray(est.variables["params"]["conv_out"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(got, params["conv_out"]["Conv_0"]["kernel"])
    mask = est(np.zeros((32, 32, 3), np.uint8))
    assert mask.shape == (32, 32) and mask.dtype == bool
