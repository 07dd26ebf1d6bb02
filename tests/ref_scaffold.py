"""Import scaffolding for the reference PyTorch implementation.

Parity tests (tests/test_reference_parity.py) need to construct the reference
torch `Compressor` (/root/reference/mcquic/modules/compressor.py:120-177) in
this environment, where several of its dependencies are absent (vlutils,
webdataset, torchvision, lmdb, fairscale) and its compiled `mcquic.rans`
pybind11 extension was never built. This module installs minimal import-time
stubs for those — none of their bodies ever run on the tested code paths —
and substitutes our ctypes rANS binding (mcquic_tpu/coding/rans.py, the same
three public symbols as the reference's rans.pyi) for the extension.

It also re-enables `EntropyCoder.__init__`: the reference snapshot disables
the v1 coder path with a leading `raise NotImplementedError`
(entropyCoder.py:17), leaving the documented initializer (uniform `_freqEMA`
ParameterList, entropyCoder.py:18-26) as dead code. The patched initializer
reproduces that documented state so `UMGMQuantizer`/`Compressor` are
constructible; encode/decode parity paths never touch the coder.

Used ONLY by tests; the product never imports the reference.
"""
import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _module(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a real spec + __path__ so importlib.util.find_spec / submodule
        # imports against the stub don't blow up
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None,
                                                      is_package=True)
        mod.__path__ = []
        sys.modules[name] = mod
    for key, value in attrs.items():
        setattr(mod, key, value)
    return mod


class _Registry:
    """Stand-in for vlutils.base.Registry: decorator + lookup, per-subclass."""

    _items: dict = {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        cls._items = {}

    def __class_getitem__(cls, item):
        return cls

    @classmethod
    def register(cls, target=None, key=None):
        if target is None:
            return lambda t: cls.register(t, key)
        if isinstance(target, str):  # @register("name") form
            return lambda t: cls.register(t, target)
        cls._items[key or target.__name__] = target
        return target

    @classmethod
    def get(cls, key, *args, **kwargs):
        return cls._items[key]


class _Restorable:
    def __init__(self, *args, **kwargs):
        pass


class _LoggerBase:
    pass


def loadReference():
    """Import and return the reference `mcquic` package (torch), stubbed and
    with the v1 EntropyCoder constructor re-enabled. Idempotent."""
    if "mcquic" in sys.modules and hasattr(sys.modules["mcquic"], "__version__"):
        return sys.modules["mcquic"]
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # ---- import-time dependency stubs --------------------------------------
    vl = _module("vlutils")
    vl.base = _module("vlutils.base", Registry=_Registry, Restorable=_Restorable)
    vl.logger = _module("vlutils.logger", LoggerBase=_LoggerBase)
    vl.saver = _module("vlutils.saver", StrPath=str)
    vl.runtime = _module("vlutils.runtime", relativePath=lambda p: str(p))
    vl.types = _module("vlutils.types", StrPath=str)
    _module("webdataset")
    _module("lmdb")
    tv = _module("torchvision")
    tv.transforms = _module("torchvision.transforms")
    tv.transforms.functional = _module("torchvision.transforms.functional",
                                       to_tensor=None)
    tv.io = _module("torchvision.io", read_image=None)
    tv.io.image = _module("torchvision.io.image", ImageReadMode=None,
                          decode_image=None)
    tv.datasets = _module("torchvision.datasets", VisionDataset=object)
    tv.datasets.folder = _module("torchvision.datasets.folder",
                                 IMG_EXTENSIONS=(".png", ".jpg", ".jpeg"),
                                 default_loader=None)
    _module("fairscale")
    _module("fairscale.nn")
    _module("fairscale.nn.checkpoint",
            checkpoint_wrapper=lambda module: module)
    _module("fairscale.nn.checkpoint.checkpoint_activations",
            checkpoint_wrapper=lambda module: module)

    # apex FusedRMSNorm -> standard RMSNorm math (the universal formula);
    # only stubbed when apex is genuinely absent, with apex's eps default
    try:
        import apex.normalization  # noqa: F401
    except ImportError:
        import torch as _torch
        from torch import nn as _nn

        class _RMSNorm(_nn.Module):
            def __init__(self, normalized_shape, eps=1e-5,
                         elementwise_affine=True):
                super().__init__()
                if isinstance(normalized_shape, int):
                    normalized_shape = (normalized_shape,)
                self.eps = eps
                self.weight = (_nn.Parameter(_torch.ones(*normalized_shape))
                               if elementwise_affine else None)

            def forward(self, x):
                norm = x * _torch.rsqrt(
                    x.pow(2).mean(-1, keepdim=True) + self.eps)
                return norm * self.weight if self.weight is not None else norm

        _module("apex")
        _module("apex.normalization", FusedRMSNorm=_RMSNorm)

    # ---- our binding takes the extension's place ---------------------------
    from mcquic_tpu.coding import rans as ourRans
    _module("mcquic.rans", RansEncoder=ourRans.RansEncoder,
            RansDecoder=ourRans.RansDecoder,
            pmfToQuantizedCDF=ourRans.pmfToQuantizedCDF)

    import mcquic  # noqa: the reference package, from /root/reference

    import torch
    from torch import nn

    from mcquic.modules import entropyCoder as refEC

    def _enabledInit(self, m, k, ema=0.9):
        # The documented v1 initializer (reference entropyCoder.py:18-26)
        # minus the leading `raise NotImplementedError`.
        nn.Module.__init__(self)
        self.encoder = ourRans.RansEncoder()
        self.decoder = ourRans.RansDecoder()
        self._freqEMA = nn.ParameterList(
            nn.Parameter(torch.ones(m, ki) / ki, requires_grad=False)
            for ki in k)
        self._k = k
        self._ema = ema
        self._cdfs = None
        self._normalizedFreq = None

    refEC.EntropyCoder.__init__ = _enabledInit
    return mcquic
