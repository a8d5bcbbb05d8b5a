"""End-to-end WSI pipeline: patch h5 -> featurize -> infer -> heatmap,
plus the featurize/infer CLIs."""

import json

import numpy as np
import pytest

import jax

from toad_tpu.config import DataConfig, EncoderConfig, ModelConfig
from toad_tpu.models.resnet_encoder import ResNetEncoder
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.pipeline.featurize import TileEmbedder, featurize_patch_file, read_patch_file, write_bag
from toad_tpu.pipeline.heatmap import render_heatmap, save_png, to_percentiles
from toad_tpu.pipeline.infer import SlideInference, infer_feature_bag, infer_patch_file

ECFG = EncoderConfig(blocks=(1, 1, 1), compute_dtype="float32")  # tiny but out_dim=1024


def _write_patch_h5(path, n=37, tile=32, seed=0):
    import h5py

    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 256, (n, tile, tile, 3), np.uint8)
    side = int(np.ceil(np.sqrt(n)))
    coords = np.array([[256 * (i % side), 256 * (i // side)] for i in range(n)], np.int64)
    with h5py.File(path, "w") as f:
        f.create_dataset("imgs", data=imgs)
        f.create_dataset("coords", data=coords)
    return imgs, coords


@pytest.fixture(scope="module")
def encoder_params():
    return ResNetEncoder(ECFG).init(jax.random.PRNGKey(0))


def test_featurize_patch_file(tmp_path, encoder_params):
    src = tmp_path / "slide1.h5"
    imgs, coords = _write_patch_h5(src, n=37)
    emb = TileEmbedder(encoder_params, ECFG, batch_size=16)  # 37 -> 3 padded batches
    out = tmp_path / "slide1_feats.h5"
    stats = featurize_patch_file(emb, src, out)
    assert stats["n_patches"] == 37

    import h5py

    with h5py.File(out) as f:
        feats = f["features"][:]
        np.testing.assert_array_equal(f["coords"][:], coords)
    assert feats.shape == (37, 1024)
    # padded last batch must not contaminate: re-embed one tile alone
    single = np.asarray(emb(imgs[36:37].repeat(16, axis=0)))[0]
    np.testing.assert_allclose(feats[36], single, rtol=1e-4, atol=1e-5)


def test_infer_from_bag_and_patches(tmp_path, encoder_params):
    mcfg = ModelConfig(in_dim=1024, n_classes=18)
    model = ToadMIL(mcfg)
    params = model.init(jax.random.PRNGKey(1))
    inf = SlideInference(params, mcfg, bucket_sizes=(64, 128))

    src = tmp_path / "s.h5"
    _write_patch_h5(src, n=50)
    emb = TileEmbedder(encoder_params, ECFG, batch_size=16)
    pred, coords = infer_patch_file(emb, inf, src, sex=1)
    assert pred.attention.shape == (50,)
    assert coords.shape == (50, 2)
    np.testing.assert_allclose(pred.y_prob.sum(), 1.0, rtol=1e-5)
    assert pred.topk[0][0] == pred.y_hat
    assert sorted(pred.y_prob)[::-1][:3] == [p for _, p in pred.topk[:3]]

    # same result from a precomputed bag (round-trip through write_bag)
    f, imgs, c = read_patch_file(src)
    feats = emb.embed_all(imgs)
    f.close()
    bag = tmp_path / "s_feats.npz"
    write_bag(bag, feats, c)
    pred2, coords2 = infer_feature_bag(inf, bag, sex=1)
    np.testing.assert_allclose(pred2.y_prob, pred.y_prob, atol=2e-5)
    np.testing.assert_array_equal(coords2, coords)


def test_bucket_padding_invariance():
    """Prediction is identical whichever bucket the bag lands in."""
    mcfg = ModelConfig(in_dim=64, n_classes=5)
    model = ToadMIL(mcfg)
    params = model.init(jax.random.PRNGKey(2))
    feats = np.random.RandomState(0).randn(40, 64).astype(np.float32)
    p_small = SlideInference(params, mcfg, bucket_sizes=(64,)).predict(feats, 0)
    p_big = SlideInference(params, mcfg, bucket_sizes=(512,)).predict(feats, 0)
    np.testing.assert_allclose(p_small.y_prob, p_big.y_prob, atol=2e-5)
    np.testing.assert_allclose(p_small.attention, p_big.attention, atol=2e-5)


def test_percentile_normalization():
    s = np.array([0.1, 5.0, 5.0, -2.0, 9.0])
    p = to_percentiles(s)
    assert p.min() == 0.0 and p.max() == 1.0
    assert p[1] == p[2]  # ties share (averaged) rank
    assert p[3] == 0.0 and p[0] < p[1] < p[4]


def test_heatmap_render_and_save(tmp_path):
    coords = np.array([[0, 0], [256, 0], [0, 256], [256, 256]])
    scores = np.array([0.0, 1.0, 2.0, 3.0])
    img = render_heatmap(coords, scores, patch_size=256, downscale=32)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # highest-attention patch is red-ish under jet, lowest blue-ish
    assert img[15, 15, 0] > img[15, 15, 2]
    assert img[0, 0, 2] > img[0, 0, 0]
    out = tmp_path / "hm.png"
    save_png(out, img)
    from PIL import Image

    back = np.asarray(Image.open(out))
    np.testing.assert_array_equal(back[..., :3], img)


def test_heatmap_background_blend():
    coords = np.array([[0, 0]])
    scores = np.array([1.0])
    bg = np.full((8, 8, 3), 100, np.uint8)
    img = render_heatmap(coords, scores, patch_size=256, downscale=32, canvas_wh=(256, 256), background=bg, alpha=0.5)
    assert img.shape == (8, 8, 3)
    assert not np.array_equal(img, bg)  # heatmap visible
    assert np.array_equal(img[7, 7], bg[7, 7]) or img[7, 7].tolist() != [100, 100, 100]


def test_infer_cli_end_to_end(tmp_path, capsys):
    """Train-free CLI chain: export random MIL params as a torch checkpoint,
    infer from a feature bag, render a heatmap."""
    mcfg = ModelConfig(in_dim=1024, n_classes=18)
    params = jax.tree.map(np.asarray, ToadMIL(mcfg).init(jax.random.PRNGKey(3)))
    from toad_tpu.models.torch_interop import export_torch_checkpoint

    ckpt = tmp_path / "s_0_checkpoint.pt"
    export_torch_checkpoint(ckpt, params)

    feats = np.random.RandomState(1).randn(80, 1024).astype(np.float32)
    side = 9
    coords = np.array([[256 * (i % side), 256 * (i // side)] for i in range(80)], np.int64)
    bag = tmp_path / "bag.npz"
    write_bag(bag, feats, coords)

    hm = tmp_path / "out.png"
    att = tmp_path / "attn.h5"
    from toad_tpu.cli import infer as infer_cli

    infer_cli.main(
        ["--ckpt", str(ckpt), "--bag", str(bag), "--sex", "F", "--heatmap", str(hm),
         "--save_attention", str(att), "--topk", "3"]
    )
    stdout = capsys.readouterr().out
    out = json.loads(stdout[stdout.index("{"):])
    assert len(out["topk"]) == 3
    assert out["n_patches"] == 80
    assert hm.exists()
    import h5py

    with h5py.File(att) as f:
        assert f["attention"].shape == (80,)
        np.testing.assert_array_equal(f["coords"][:], coords)


def test_mesh_tile_embedder_parity(encoder_params):
    """Mesh-sharded TileEmbedder must reproduce the unsharded embedder over
    the 8-device CPU mesh: the encoder is per-tile math, so GSPMD splits the
    batch with no collectives and f32 results are bit-identical."""
    from jax.sharding import Mesh

    devs = jax.devices()
    assert len(devs) >= 8, "conftest forces an 8-device virtual CPU platform"
    mesh = Mesh(np.array(devs[:8]), ("data",))
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (40, 32, 32, 3), np.uint8)  # 3 batches, last padded
    base = TileEmbedder(encoder_params, ECFG, batch_size=16)
    sharded = TileEmbedder(encoder_params, ECFG, batch_size=16, mesh=mesh)
    ref = base.embed_all(imgs)
    got = sharded.embed_all(imgs)
    assert got.shape == ref.shape == (40, 1024)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    # batch not divisible by the mesh axis is a loud constructor error
    with pytest.raises(ValueError, match="not divisible"):
        TileEmbedder(encoder_params, ECFG, batch_size=12, mesh=mesh)


def test_featurize_cli_data_shards(tmp_path, encoder_params, monkeypatch):
    """--data_shards wires a real mesh through the featurize CLI and the
    sharded bags match the single-device ones."""
    patch_dir = tmp_path / "patches"
    patch_dir.mkdir()
    _write_patch_h5(patch_dir / "slide0.h5", n=20, seed=7)
    import toad_tpu.cli.featurize as fcli

    monkeypatch.setattr(
        fcli, "EncoderConfig", lambda **kw: EncoderConfig(blocks=(1, 1, 1), **kw)
    )
    base = ["--patch_dir", str(patch_dir), "--format", "npy",
            "--batch_size", "8", "--no_bf16"]
    fcli.main(base + ["--feat_dir", str(tmp_path / "f1")])
    fcli.main(base + ["--feat_dir", str(tmp_path / "f8"), "--data_shards", "8"])
    ref = np.load(tmp_path / "f1" / "slide0.npy")
    got = np.load(tmp_path / "f8" / "slide0.npy")
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    with pytest.raises(SystemExit):
        fcli.main(base + ["--feat_dir", str(tmp_path / "f0"), "--data_shards", "0"])
    with pytest.raises(SystemExit):
        fcli.main(base + ["--feat_dir", str(tmp_path / "f9"), "--data_shards", "999"])
    with pytest.raises(SystemExit, match="not divisible"):
        fcli.main(base + ["--feat_dir", str(tmp_path / "f3"), "--data_shards", "3"])


def test_featurize_cli(tmp_path, encoder_params, monkeypatch):
    patch_dir = tmp_path / "patches"
    patch_dir.mkdir()
    for i in range(2):
        _write_patch_h5(patch_dir / f"slide{i}.h5", n=20, seed=i)
    feat_dir = tmp_path / "feats"
    # keep the CLI's default-size random encoder from dominating test time
    import toad_tpu.cli.featurize as fcli

    monkeypatch.setattr(
        fcli, "EncoderConfig", lambda **kw: EncoderConfig(blocks=(1, 1, 1), **kw)
    )
    fcli.main(
        ["--patch_dir", str(patch_dir), "--feat_dir", str(feat_dir),
         "--format", "npy", "--batch_size", "8", "--no_bf16"]
    )
    for i in range(2):
        feats = np.load(feat_dir / f"slide{i}.npy")
        assert feats.shape == (20, 1024)


def test_featurize_skip_done_format_aware(tmp_path, monkeypatch, capsys):
    """--skip_done must not treat an f32 .npz as the int8 output (same
    extension, different payload), and stale bags in higher-priority formats
    are reported as shadowing the new store."""
    import zipfile

    patch_dir = tmp_path / "patches"
    patch_dir.mkdir()
    _write_patch_h5(patch_dir / "s.h5", n=12, seed=0)
    feat_dir = tmp_path / "feats"
    import toad_tpu.cli.featurize as fcli

    monkeypatch.setattr(
        fcli, "EncoderConfig", lambda **kw: EncoderConfig(blocks=(1, 1, 1), **kw)
    )
    base = ["--patch_dir", str(patch_dir), "--feat_dir", str(feat_dir),
            "--batch_size", "8", "--no_bf16"]
    fcli.main(base + ["--format", "npz"])
    assert "features.npy" in zipfile.ZipFile(feat_dir / "s.npz").namelist()

    # int8 + --skip_done over the f32 store: must re-featurize, not skip
    fcli.main(base + ["--format", "int8", "--skip_done"])
    assert "features_int8.npy" in zipfile.ZipFile(feat_dir / "s.npz").namelist()
    capsys.readouterr()

    # now it really is done: skipped
    fcli.main(base + ["--format", "int8", "--skip_done"])
    assert "exists, skipped" in capsys.readouterr().out

    # a stale .npy would shadow the .npz at load time (bag_path preference)
    np.save(feat_dir / "s.npy", np.zeros((3, 1024), np.float32))
    fcli.main(base + ["--format", "int8"])
    out = capsys.readouterr().out
    assert "WARNING" in out and '"shadowed_stale_bags": 1' in out


def test_predict_cli_bulk(tmp_path, capsys):
    """Unlabeled bulk prediction: bags dir + manifest -> predictions CSV."""
    import pandas as pd

    mcfg = ModelConfig(in_dim=1024, n_classes=18)
    params = jax.tree.map(np.asarray, ToadMIL(mcfg).init(jax.random.PRNGKey(5)))
    from toad_tpu.models.torch_interop import export_torch_checkpoint

    ckpt = tmp_path / "s_0_checkpoint.pt"
    export_torch_checkpoint(ckpt, params)

    rng = np.random.RandomState(2)
    bags_dir = tmp_path / "bags"
    bags_dir.mkdir()
    for i in range(3):
        np.save(bags_dir / f"S{i}.npy", rng.randn(30 + i * 10, 1024).astype(np.float32))
    manifest = tmp_path / "m.csv"
    pd.DataFrame({"slide_id": ["S0", "S1", "S2"], "sex": ["F", "M", "F"]}).to_csv(manifest, index=False)

    from toad_tpu.cli import predict as predict_cli

    out = tmp_path / "preds.csv"
    predict_cli.main(["--ckpt", str(ckpt), "--data_dir", str(bags_dir),
                      "--csv", str(manifest), "--out", str(out)])
    df = pd.read_csv(out)
    assert len(df) == 3
    assert {"slide_id", "Y_hat", "top1", "top1_p", "site", "site_p"} <= set(df.columns)
    np.testing.assert_allclose(df[[f"p_{c}" for c in range(18)]].sum(axis=1), 1.0, rtol=1e-4)

    # no manifest: discovers bags, needs --sex fallback
    out2 = tmp_path / "preds2.csv"
    predict_cli.main(["--ckpt", str(ckpt), "--data_dir", str(bags_dir),
                      "--out", str(out2), "--sex", "M"])
    assert len(pd.read_csv(out2)) == 3


def test_predict_truncates_oversized_bags():
    """Bags beyond the largest bucket are head-truncated, not a crash."""
    mcfg = ModelConfig(in_dim=32, n_classes=5)
    inf = SlideInference(ToadMIL(mcfg).init(jax.random.PRNGKey(9)), mcfg, bucket_sizes=(64, 128))
    feats = np.random.RandomState(0).randn(300, 32).astype(np.float32)
    pred = inf.predict(feats, sex=0)
    assert pred.attention.shape == (128,)
    # equals predicting the head-truncated bag directly
    pred2 = inf.predict(feats[:128], sex=0)
    np.testing.assert_allclose(pred.y_prob, pred2.y_prob, atol=1e-6)


def test_predict_cli_nan_sex_falls_back(tmp_path, capsys):
    import pandas as pd

    mcfg = ModelConfig(in_dim=1024, n_classes=18)
    params = jax.tree.map(np.asarray, ToadMIL(mcfg).init(jax.random.PRNGKey(6)))
    from toad_tpu.models.torch_interop import export_torch_checkpoint

    ckpt = tmp_path / "c.pt"
    export_torch_checkpoint(ckpt, params)
    bags_dir = tmp_path / "bags"
    bags_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        np.save(bags_dir / f"S{i}.npy", rng.randn(20, 1024).astype(np.float32))
    # int-coded sex column with one missing value -> pandas floats + NaN
    manifest = tmp_path / "m.csv"
    pd.DataFrame({"slide_id": ["S0", "S1"], "sex": [1, None]}).to_csv(manifest, index=False)

    from toad_tpu.cli import predict as predict_cli

    out = tmp_path / "p.csv"
    predict_cli.main(["--ckpt", str(ckpt), "--data_dir", str(bags_dir),
                      "--csv", str(manifest), "--out", str(out), "--sex", "F", "--topk", "0"])
    df = pd.read_csv(out)
    assert df["sex"].tolist() == [1, 0]  # 1.0 parsed; NaN -> --sex F


def test_heatmap_cli_from_attention_file(tmp_path, capsys):
    import h5py

    from toad_tpu.cli import heatmap as hm_cli

    n = 16
    coords = np.array([[256 * (i % 4), 256 * (i // 4)] for i in range(n)], np.int64)
    with h5py.File(tmp_path / "a.h5", "w") as f:
        f.create_dataset("attention", data=np.linspace(0, 1, n).astype(np.float32))
        f.create_dataset("coords", data=coords)
    out = tmp_path / "hm.png"
    hm_cli.main(["--attention", str(tmp_path / "a.h5"), "--out", str(out)])
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (32, 32, 3)

    # blended over an auto-resized thumbnail
    Image.fromarray(np.full((100, 100, 3), 120, np.uint8)).save(tmp_path / "thumb.png")
    out2 = tmp_path / "hm2.png"
    hm_cli.main(["--attention", str(tmp_path / "a.h5"), "--out", str(out2),
                 "--background", str(tmp_path / "thumb.png"), "--alpha", "0.4"])
    assert out2.exists()


def test_site_attention_exposed():
    mcfg = ModelConfig(in_dim=32, n_classes=5)
    inf = SlideInference(ToadMIL(mcfg).init(jax.random.PRNGKey(11)), mcfg, bucket_sizes=(64,))
    feats = np.random.RandomState(0).randn(40, 32).astype(np.float32)
    pred = inf.predict(feats, sex=1)
    assert pred.site_attention.shape == (40,)
    # the two tasks genuinely attend differently
    assert not np.allclose(pred.attention, pred.site_attention)


def test_inference_temperature():
    """--temperature plumbing: T=1 is the identity; T>1 flattens class probs
    via logits/T (exactly apply_temperature of the raw probs), preserves the
    argmax/topk order and attention, and leaves site probs raw."""
    from toad_tpu.evaluate.calibration import apply_temperature

    mcfg = ModelConfig(in_dim=1024, n_classes=18)
    params = ToadMIL(mcfg).init(jax.random.PRNGKey(3))
    feats = np.random.RandomState(7).randn(40, 1024).astype(np.float32)

    p1 = SlideInference(params, mcfg, bucket_sizes=(64,)).predict(feats, 1)
    p4 = SlideInference(params, mcfg, bucket_sizes=(64,), temperature=4.0).predict(feats, 1)
    np.testing.assert_allclose(p4.y_prob, apply_temperature(p1.y_prob[None], 4.0)[0], atol=1e-6)
    assert p4.y_hat == p1.y_hat
    assert [i for i, _ in p4.topk] == [i for i, _ in p1.topk]
    np.testing.assert_allclose(p4.site_prob, p1.site_prob, atol=0)
    np.testing.assert_allclose(p4.attention, p1.attention, atol=0)
    assert p4.y_prob.max() < p1.y_prob.max()  # flatter

    import pytest

    with pytest.raises(ValueError, match="temperature"):
        SlideInference(params, mcfg, temperature=0.0)


def test_predict_bf16_wire_matches_f32_wire():
    """bf16-compute SlideInference ships the bag in bf16 (half the H2D
    bytes); bit-identical to shipping f32 and casting on device — the cast
    is round-to-nearest-even on either side of the wire."""
    import jax.numpy as jnp

    mcfg = ModelConfig(in_dim=1024, n_classes=18, compute_dtype="bfloat16")
    model = ToadMIL(mcfg)
    params = model.init(jax.random.PRNGKey(3))
    inf = SlideInference(params, mcfg, bucket_sizes=(64,))
    feats = np.random.RandomState(5).randn(40, 1024).astype(np.float32)

    got = inf.predict(feats, 1)

    # f32-wire oracle: same jitted forward, features transferred as f32
    from toad_tpu.pipeline.infer import _pad_bag

    bag, bag_mask = _pad_bag(feats, 64)
    logits, site_logits, _ = inf._fwd(
        inf.params, jnp.asarray(bag[None]), jnp.asarray(bag_mask[None]),
        jnp.asarray([1], jnp.int32)
    )
    want = np.asarray(jax.nn.softmax(np.asarray(logits, np.float32)[0]))
    np.testing.assert_array_equal(got.y_prob, want)


# ---- tile-directory (pixels-from-disk) featurization -----------------------


def _write_tile_dir(root, n=21, tile=32, seed=3, ext="png", coords_in_name=True):
    from PIL import Image

    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 256, (n, tile, tile, 3), np.uint8)
    coords = np.array([[256 * (i % 5), 256 * (i // 5)] for i in range(n)], np.int64)
    for i in range(n):
        name = f"t{i:04d}_{coords[i, 0]}_{coords[i, 1]}" if coords_in_name else f"t{i:04d}"
        Image.fromarray(imgs[i]).save(root / f"{name}.{ext}")
    return imgs, coords


def test_iter_decoded_tile_batches_matches_files(tmp_path):
    from toad_tpu.pipeline.featurize import iter_decoded_tile_batches, list_tile_files

    imgs, _ = _write_tile_dir(tmp_path / "s1", n=21)
    files = list_tile_files(tmp_path / "s1")
    assert len(files) == 21
    stats = {}
    got, valids = [], []
    for batch, valid in iter_decoded_tile_batches(files, batch_size=8, stats=stats):
        assert batch.shape == (8, 32, 32, 3) and batch.dtype == np.uint8
        got.append(batch[:valid])
        valids.append(valid)
    assert valids == [8, 8, 5]
    np.testing.assert_array_equal(np.concatenate(got), imgs)  # PNG is lossless
    assert stats["decode_s"] > 0


def test_tile_coords_parse_all_or_nothing(tmp_path):
    from toad_tpu.pipeline.featurize import list_tile_files, parse_tile_coords

    _, coords = _write_tile_dir(tmp_path / "a", n=7)
    np.testing.assert_array_equal(parse_tile_coords(list_tile_files(tmp_path / "a")), coords)
    _write_tile_dir(tmp_path / "b", n=7, coords_in_name=False)
    assert parse_tile_coords(list_tile_files(tmp_path / "b")) is None


def test_iter_decoded_tile_batches_shape_mismatch_raises(tmp_path):
    from PIL import Image

    from toad_tpu.pipeline.featurize import iter_decoded_tile_batches, list_tile_files

    _write_tile_dir(tmp_path / "s", n=3, tile=32)
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(tmp_path / "s" / "zz_odd.png")
    with pytest.raises(ValueError, match="tile shape"):
        list(iter_decoded_tile_batches(list_tile_files(tmp_path / "s"), batch_size=4))


def test_featurize_tile_dir_matches_patch_file(tmp_path, encoder_params):
    """Same pixels through the tile-dir path and the h5 path give the same bag."""
    import h5py

    from toad_tpu.pipeline.featurize import featurize_tile_dir

    imgs, coords = _write_tile_dir(tmp_path / "slide9", n=21)
    with h5py.File(tmp_path / "slide9.h5", "w") as f:
        f.create_dataset("imgs", data=imgs)
        f.create_dataset("coords", data=coords)
    emb = TileEmbedder(encoder_params, ECFG, batch_size=8)
    stats = featurize_tile_dir(emb, tmp_path / "slide9", tmp_path / "from_tiles.h5")
    assert stats["n_patches"] == 21 and stats["decode_s"] > 0
    featurize_patch_file(emb, tmp_path / "slide9.h5", tmp_path / "from_h5.h5")
    with h5py.File(tmp_path / "from_tiles.h5") as a, h5py.File(tmp_path / "from_h5.h5") as b:
        np.testing.assert_allclose(a["features"][:], b["features"][:], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(a["coords"][:], coords)
        np.testing.assert_array_equal(b["coords"][:], coords)


def test_featurize_cli_tile_dir(tmp_path, encoder_params, monkeypatch, capsys):
    from toad_tpu.cli import featurize as cli

    _write_tile_dir(tmp_path / "tiles" / "s_a", n=9)
    _write_tile_dir(tmp_path / "tiles" / "s_b", n=5, seed=4)
    monkeypatch.setattr(
        "toad_tpu.models.resnet_encoder.ResNetEncoder.init", lambda self, key: encoder_params
    )
    monkeypatch.setattr("toad_tpu.cli.featurize.EncoderConfig", lambda **kw: ECFG)
    cli.main([
        "--tile_dir", str(tmp_path / "tiles"), "--feat_dir", str(tmp_path / "feats"),
        "--format", "npy", "--batch_size", "8",
    ])
    a = np.load(tmp_path / "feats" / "s_a.npy")
    b = np.load(tmp_path / "feats" / "s_b.npy")
    assert a.shape == (9, 1024) and b.shape == (5, 1024)
    assert (tmp_path / "feats" / "s_a.coords.npy").exists()  # filename coords survive
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["slides"] == 2 and summary["patches"] == 14


def test_featurize_cli_rejects_both_sources(tmp_path):
    from toad_tpu.cli import featurize as cli

    with pytest.raises(SystemExit, match="exactly one"):
        cli.main([
            "--patch_dir", str(tmp_path), "--tile_dir", str(tmp_path),
            "--feat_dir", str(tmp_path / "f"),
        ])
