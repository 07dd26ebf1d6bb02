"""Streamlit service logic (service/stCompressService.py) driven through a
stub streamlit: compress branch, plain + tiled restore branches, size guard.
(streamlit itself is not installed here; the stub provides the six APIs the
app touches.)"""
import importlib
import io
import sys
import types

import numpy as np
import pytest
from PIL import Image

MODEL = "assets/tiny_demo_672919fb.mcquic.npz"


class _StubStreamlit(types.ModuleType):
    def __init__(self):
        super().__init__("streamlit")
        self.reset()

    def reset(self, upload=None):
        self.upload = upload
        self.images = []
        self.texts = []
        self.errors = []
        self.downloads = []

    # --- API surface the app uses
    def cache_resource(self, fn):
        return fn

    def title(self, *_):
        pass

    def file_uploader(self, *_, **__):
        return self.upload

    def text(self, value):
        self.texts.append(str(value))

    def image(self, img, **_):
        self.images.append(np.asarray(img))

    def error(self, msg):
        self.errors.append(str(msg))

    def download_button(self, label, data, file_name=None, **_):
        self.downloads.append((label, bytes(data), file_name))


class _Upload:
    def __init__(self, name, data):
        self.name = name
        self._data = data

    def read(self):
        return self._data


@pytest.fixture()
def app(monkeypatch):
    stub = _StubStreamlit()
    monkeypatch.setitem(sys.modules, "streamlit", stub)
    monkeypatch.setenv("MCQUIC_MODEL", MODEL)
    sys.modules.pop("mcquic_tpu.service.stCompressService", None)
    module = importlib.import_module("mcquic_tpu.service.stCompressService")
    return module, stub


def _pngBytes(img):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_compress_branch_produces_mcq(app):
    module, stub = app
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
    stub.reset(_Upload("photo.png", _pngBytes(img)))
    module.main()
    labels = [d[0] for d in stub.downloads]
    assert any(".mcq" in (d[2] or "") for d in stub.downloads), labels
    assert stub.images, "decoded preview missing"


def test_restore_branch_plain_mcq(app):
    module, stub = app
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
    engine = module._engine()
    blob = engine.compressImage(img).serialize()
    stub.reset(_Upload("x.mcq", blob))
    module.main()
    assert stub.images and stub.images[0].shape == img.shape
    assert any((d[2] or "").endswith(".png") for d in stub.downloads)


def test_restore_branch_tiled_mcq(app):
    module, stub = app
    from mcquic_tpu.models.tiling import compressTiled

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (150, 200, 3), dtype=np.uint8)
    engine = module._engine()
    blob = compressTiled(engine, img, tile=128).serialize()
    stub.reset(_Upload("big.mcq", blob))
    module.main()
    assert stub.images and stub.images[0].shape == img.shape


def test_size_guard(app):
    module, stub = app
    huge = np.zeros((module.MAX_PIXELS // 100 + 1, 100, 3), np.uint8)
    stub.reset(_Upload("huge.png", _pngBytes(huge)))
    module.main()
    assert stub.errors and "too large" in stub.errors[0]
