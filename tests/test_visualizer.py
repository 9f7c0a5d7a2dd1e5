"""Visualizer figure dumping."""
import numpy as np

from dualpixelface_tpu.utils.visualizer import save_result_fig_depth


class Opt:
    def __init__(self, output_path):
        self.output_path = output_path


def test_save_result_fig_depth(tmp_path):
    rng = np.random.default_rng(0)
    b, h, w = 2, 32, 32
    results = {
        "pred_depth": rng.uniform(-2, 3, (b, 1, h, w)).astype(np.float32),
        "pred_normal": rng.uniform(-1, 1, (b, 1, h, w, 3)).astype(np.float32),
    }
    batch = {
        "left": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "depth": rng.uniform(800, 1200, (b, h, w)).astype(np.float32),
        "mask": np.ones((b, h, w), np.float32),
        "normal": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
    }
    out_dir = save_result_fig_depth(Opt(str(tmp_path)), results, batch, epoch=0, step=3, mode="TEST")
    figs = sorted(out_dir.glob("*.png"))
    assert len(figs) == b
    from PIL import Image

    img = Image.open(figs[0])
    assert img.size[1] == h and img.size[0] == w * 5  # five panels
