"""Image tiling -> patch h5 -> featurize -> infer: the raw-pixels chain."""

import numpy as np
import pytest

import jax

from toad_tpu.config import EncoderConfig, ModelConfig
from toad_tpu.models.resnet_encoder import ResNetEncoder
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.pipeline.featurize import TileEmbedder, read_patch_file
from toad_tpu.pipeline.infer import SlideInference, infer_patch_file
from toad_tpu.pipeline.tiling import image_to_patch_file, saturation, tile_image, write_patch_h5


def _synthetic_slide(h=200, w=300, square=((64, 64), (192, 192))):
    """White background (no tissue) with one saturated magenta region."""
    img = np.full((h, w, 3), 245, np.uint8)
    (y0, x0), (y1, x1) = square
    img[y0:y1, x0:x1] = (180, 40, 160)
    return img


def test_tile_grid_and_coords():
    img = _synthetic_slide()
    imgs, coords = tile_image(img, patch_size=64, tissue_threshold=None)
    # 200//64=3 rows x 300//64=4 cols (partial edges dropped)
    assert imgs.shape == (12, 64, 64, 3)
    assert coords.min() == 0 and coords[:, 0].max() == 192 and coords[:, 1].max() == 128
    # coords are (x, y): the tile at coord (64, 64) is the magenta block
    idx = np.where((coords == (64, 64)).all(axis=1))[0][0]
    np.testing.assert_array_equal(imgs[idx][0, 0], (180, 40, 160))


def test_tissue_filter_drops_background():
    img = _synthetic_slide()
    imgs, coords = tile_image(img, patch_size=64, tissue_threshold=0.05)
    # only the fully-magenta tiles survive: (64,64), (128,64), (64? rows...)
    assert 0 < len(imgs) < 12
    assert (saturation(imgs) > 0.05).all()
    for x, y in coords:
        assert 64 <= x < 192 and 64 <= y < 192  # inside the tissue square


def test_overlapping_stride():
    img = _synthetic_slide()
    imgs, coords = tile_image(img, patch_size=64, stride=32, tissue_threshold=None)
    assert len(imgs) > 12  # denser grid
    assert len(np.unique(coords[:, 0])) > 4


def test_tiny_image_empty():
    imgs, coords = tile_image(np.zeros((10, 10, 3), np.uint8), patch_size=64)
    assert imgs.shape == (0, 64, 64, 3) and coords.shape == (0, 2)


def test_full_chain_image_to_prediction(tmp_path):
    from PIL import Image

    img = _synthetic_slide(h=256, w=256, square=((32, 32), (224, 224)))
    src = tmp_path / "slide.png"
    Image.fromarray(img).save(src)
    out = tmp_path / "slide.h5"
    stats = image_to_patch_file(src, out, patch_size=32, tissue_threshold=0.05)
    assert stats["n_patches"] > 0

    f, imgs, coords = read_patch_file(out)
    assert imgs.shape[1:] == (32, 32, 3)
    f.close()

    ecfg = EncoderConfig(blocks=(1, 1, 1), compute_dtype="float32")
    emb = TileEmbedder(ResNetEncoder(ecfg).init(jax.random.PRNGKey(0)), ecfg, batch_size=8)
    mcfg = ModelConfig(in_dim=1024, n_classes=18)
    inf = SlideInference(ToadMIL(mcfg).init(jax.random.PRNGKey(1)), mcfg, bucket_sizes=(64, 128))
    pred, c = infer_patch_file(emb, inf, out, sex=0)
    assert pred.attention.shape[0] == stats["n_patches"]
    np.testing.assert_allclose(pred.y_prob.sum(), 1.0, rtol=1e-5)


def test_tile_cli(tmp_path, capsys):
    from PIL import Image

    from toad_tpu.cli import tile as tile_cli

    d = tmp_path / "images"
    d.mkdir()
    for i in range(2):
        Image.fromarray(_synthetic_slide()).save(d / f"s{i}.png")
    tile_cli.main(["--image_dir", str(d), "--patch_dir", str(tmp_path / "patches"),
                   "--patch_size", "64"])
    import h5py

    for i in range(2):
        with h5py.File(tmp_path / "patches" / f"s{i}.h5") as f:
            assert f["imgs"].shape[0] > 0
            assert f["coords"].shape[1] == 2


def test_tile_embedder_sharded_matches_single():
    """Data-parallel featurization over a mesh == single-device embedding."""
    from jax.sharding import Mesh

    ecfg = EncoderConfig(blocks=(1, 1, 1), compute_dtype="float32")
    params = ResNetEncoder(ecfg).init(jax.random.PRNGKey(0))
    tiles = np.random.RandomState(0).randint(0, 256, (16, 32, 32, 3), np.uint8)

    single = TileEmbedder(params, ecfg, batch_size=8)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    sharded = TileEmbedder(params, ecfg, batch_size=8, mesh=mesh)
    a = single.embed_all(tiles)
    b = sharded.embed_all(tiles)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="divisible"):
        TileEmbedder(params, ecfg, batch_size=6, mesh=mesh)
