"""Metrics, transforms, augmentation, loaders."""
import io
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcquic_tpu.data.augment import planckianJitter, randomFlips, trainingTransform
from mcquic_tpu.data.transforms import (alignedCrop, alignedPadding, centerCropTo,
                                        imageToModelInput, modelOutputToImage)
from mcquic_tpu.validate.metrics import msSSIM, psnr, ssim


def test_psnr_identical_is_high():
    x = np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    assert float(psnr(x, x)) > 80


def test_ssim_identical_is_one():
    x = np.random.default_rng(1).uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-4)


def test_msssim_orders_quality():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 255, (1, 192, 192, 3)).astype(np.float32)
    slight = x + rng.normal(0, 5, x.shape).astype(np.float32)
    heavy = x + rng.normal(0, 50, x.shape).astype(np.float32)
    mSlight = float(msSSIM(x, slight))
    mHeavy = float(msSSIM(x, heavy))
    assert mSlight > mHeavy
    assert float(msSSIM(x, x)) == pytest.approx(1.0, abs=1e-4)


def test_aligned_padding_and_crop():
    x = np.random.default_rng(3).uniform(size=(1, 50, 70, 3)).astype(np.float32)
    padded = alignedPadding(x, 64)
    assert padded.shape == (1, 64, 128, 3)
    back = centerCropTo(padded, 50, 70)
    np.testing.assert_array_equal(back, x)
    cropped = alignedCrop(np.zeros((130, 200, 3)), 64)
    assert cropped.shape == (128, 192, 3)


def test_image_domain_roundtrip():
    img = np.random.default_rng(4).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    x = imageToModelInput(img)
    assert x.min() >= -1 and x.max() <= 1
    back = modelOutputToImage(x)
    np.testing.assert_array_equal(back, img)


def test_training_transform_shapes_and_range():
    batch = jnp.asarray(np.random.default_rng(5).integers(0, 256, (4, 32, 32, 3),
                                                          dtype=np.uint8))
    out = trainingTransform(jax.random.PRNGKey(0), batch)
    assert out.shape == (4, 32, 32, 3)
    assert float(out.min()) >= -1.0 - 1e-5 and float(out.max()) <= 1.0 + 1e-5


def test_flips_preserve_content():
    x = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    y = randomFlips(jax.random.PRNGKey(1), x)
    # multiset of values unchanged per image
    np.testing.assert_allclose(np.sort(np.asarray(y).reshape(2, -1)),
                               np.sort(np.asarray(x).reshape(2, -1)))


def test_tar_shard_loader(tmp_path):
    from PIL import Image

    from mcquic_tpu.data import getTrainLoader
    shard = tmp_path / "mcquic_DATA_00000.tar"
    with tarfile.open(shard, "w") as tf:
        rng = np.random.default_rng(6)
        for i in range(6):
            img = Image.fromarray(rng.integers(0, 256, (80, 96, 3), dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:06d}.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    loaderFn = getTrainLoader(str(tmp_path / "*.tar"), batchSize=2, cropSize=32,
                              shuffleBuffer=4)
    batches = list(loaderFn())
    assert len(batches) == 3
    assert batches[0].shape == (2, 32, 32, 3)
    assert batches[0].dtype == np.uint8


def test_dataset_builder_cli(tmp_path):
    from PIL import Image

    from mcquic_tpu.data.cli import main as buildDataset
    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(7)
    # one valid (big, textured), one too small
    Image.fromarray(rng.integers(0, 256, (600, 600, 3), dtype=np.uint8)).save(src / "big.png")
    Image.fromarray(rng.integers(0, 256, (100, 100, 3), dtype=np.uint8)).save(src / "small.png")
    out = tmp_path / "shards"
    total = buildDataset(src, out, jobs=1)
    assert total == 1
    assert (out / "metadata.json").exists()


def test_imagenet_folder_gen_loader(tmp_path):
    from PIL import Image

    from mcquic_tpu.data.imagenet_classes import folderClassIndex, getGenLoader

    rng = np.random.default_rng(8)
    for wnid in ["n01440764", "n01443537"]:
        d = tmp_path / wnid
        d.mkdir()
        for i in range(3):
            Image.fromarray(rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
                            ).save(d / f"{wnid}_{i}.JPEG")
    index = folderClassIndex(tmp_path)
    assert index == {"n01440764": 0, "n01443537": 1}
    loaderFn = getGenLoader(str(tmp_path), batchSize=2, cropSize=32)
    images, labels = next(iter(loaderFn()))
    assert images.shape == (2, 32, 32, 3) and images.dtype == np.uint8
    assert labels.dtype == np.int32 and set(labels) <= {0, 1}


def test_dataset_builder_parallel_jobs_deterministic(tmp_path):
    """jobs>1 honored: parallel split writers + merge (reference
    data/cli.py:123-148); deterministic byte-identical shards run-to-run and
    identical sample sets vs jobs=1."""
    import hashlib
    import tarfile as tarmod

    from PIL import Image

    from mcquic_tpu.data.cli import main as buildDataset

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(9)
    for i in range(5):
        Image.fromarray(rng.integers(0, 256, (520, 520, 3), dtype=np.uint8)
                        ).save(src / f"im{i}.png")

    def samples(outDir):
        got = {}
        for shard in sorted(outDir.glob("*.tar.gz")):
            with tarmod.open(shard) as tf:
                for member in tf.getmembers():
                    got[member.name] = hashlib.sha256(
                        tf.extractfile(member).read()).hexdigest()
        return got

    outs = []
    for run in range(2):
        out = tmp_path / f"p{run}"
        assert buildDataset(src, out, jobs=2) == 5
        outs.append(out)
    # run-to-run determinism, byte level
    for a, b in zip(sorted(outs[0].glob("*.tar.gz")), sorted(outs[1].glob("*.tar.gz"))):
        assert a.name == b.name and a.read_bytes() == b.read_bytes()
    # no staging dirs left behind
    assert not list(outs[0].glob("split*"))
    # same sample set as a single-writer build
    single = tmp_path / "s"
    assert buildDataset(src, single, jobs=1) == 5
    assert samples(single) == samples(outs[0])
    import json
    meta = json.loads((outs[0] / "metadata.json").read_text())
    assert meta["count"] == 5 and meta["shards"] == 2


def test_gen_shard_loader_with_wnid_keys(tmp_path):
    """Gen loader streams wnid-keyed webdataset shards with labels derived
    from the key prefix (reference data/__init__.py:89: __key__.split('_')[0])."""
    import io
    import tarfile as tarmod

    from PIL import Image

    from mcquic_tpu.data.imagenet_classes import getGenLoader, shardClassIndex

    rng = np.random.default_rng(5)
    wnids = ["n01440764", "n01443537"]
    with tarmod.open(tmp_path / "gen_00000.tar", "w") as tf:
        for wnid in wnids:
            for i in range(3):
                img = Image.fromarray(rng.integers(0, 256, (80, 80, 3), dtype=np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                info = tarmod.TarInfo(f"{wnid}_{i}.jpg")
                info.size = buf.getbuffer().nbytes
                tf.addfile(info, io.BytesIO(buf.getvalue()))
    pattern = str(tmp_path / "*.tar")
    assert shardClassIndex(pattern) == {"n01440764": 0, "n01443537": 1}
    loaderFn = getGenLoader(pattern, batchSize=2, cropSize=32)
    images, labels = next(iter(loaderFn()))
    assert images.shape == (2, 32, 32, 3) and images.dtype == np.uint8
    assert labels.dtype == np.int32 and set(labels) <= {0, 1}
    # sidecar classes.json overrides the scan (full class set)
    (tmp_path / "classes.json").write_text('["n01440764", "n01443537", "n01484850"]')
    assert len(shardClassIndex(pattern)) == 3


def test_dataset_builder_more_jobs_than_images(tmp_path):
    """jobs > kept images must not stage/merge empty shards (review finding)."""
    import json
    import tarfile as tarmod

    from PIL import Image

    from mcquic_tpu.data.cli import main as buildDataset

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(11)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (520, 520, 3), dtype=np.uint8)
                        ).save(src / f"im{i}.png")
    out = tmp_path / "shards"
    assert buildDataset(src, out, jobs=8) == 3
    shards = sorted(out.glob("*.tar.gz"))
    assert len(shards) == 3  # one per non-empty chunk, none empty
    for shard in shards:
        with tarmod.open(shard) as tf:
            assert len(tf.getmembers()) >= 1
    meta = json.loads((out / "metadata.json").read_text())
    assert meta == {"count": 3, "shards": 3, "imageText": False}
