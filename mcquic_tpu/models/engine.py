"""CompressorEngine: the host-side codec object tying together the flax model,
the rANS coder and the `.mcq` container.

This is the TPU-native equivalent of the reference's stateful
`BaseCompressor.compress/decompress/encode/decode` surface
(`mcquic/modules/compressor.py:67-117`): the flax module stays a pure
function; the engine owns parameters, jit caches (one executable per padded
input shape), frequency tables, padding/cropping, and the device↔host
pipeline into the native entropy coder.
"""
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import mcquic_tpu
from mcquic_tpu.coding import RansCoder
from mcquic_tpu.container import CodeSize, File, FileHeader, ImageSize
from mcquic_tpu.data.transforms import alignedPadding, centerCropTo
from mcquic_tpu.models.compressor import Compressor, Neon


def _findFreqEMAs(coderState: dict) -> List[np.ndarray]:
    """Collect per-level [m,k] freq tables from the `coder` collection.

    UMGMQuantizer stores `freqEMA{i}` leaves; ResidualBackwardQuantizer stores
    one stacked `freqEMA` [L, m, k] leaf.
    """
    found: Dict[str, np.ndarray] = {}

    def visit(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, path + (k,))
        else:
            name = path[-1]
            if name.startswith("freqEMA"):
                found[name] = np.asarray(node)

    visit(coderState, ())
    if "freqEMA" in found and len(found) == 1:
        stacked = found["freqEMA"]
        return [stacked[i] for i in range(stacked.shape[0])]
    return [found[f"freqEMA{i}"] for i in range(len(found))]


class CompressorEngine:
    """Owns (module, variables); exposes compress/decompress/encode/decode.

    Pass a `jax.sharding.Mesh` to serve batches data-parallel across every
    device on the mesh: parameters are replicated once, batches whose leading
    dim divides the 'data' axis are sharded across it, and the same jitted
    executables run SPMD (GSPMD partitions the convs; there is no cross-image
    communication in a codec, so scaling is embarrassingly parallel over
    ICI-local shards). The reference has no distributed-inference path — its
    speed test is one GPU (`mcquic/validate/validator.py:60-97`); this is the
    TPU-native serving story (SURVEY.md §2.3)."""

    def __init__(self, module, variables, qp: str = "-1", base: int = 128,
                 mesh=None):
        self._module = module
        self._variables = variables
        self._qp = qp
        self._base = base
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from mcquic_tpu.parallel import batchSharding, replicatedShardings
            self._batchSharding = batchSharding(mesh)
            self._repSharding = NamedSharding(mesh, PartitionSpec())
            self._dataSize = int(mesh.shape["data"])
            self._variables = jax.device_put(
                variables, replicatedShardings(mesh, variables))

        if isinstance(module, Neon):
            L = len(module.size)
            self._m = [1] * L
            self._k = [module.k] * L
        elif isinstance(module, Compressor):
            self._m = [module.m] * len(module.k)
            self._k = list(module.k)
        else:
            raise TypeError(f"Unknown compressor module {type(module)}")

        self._coder = RansCoder(self._m, self._k)
        self.refreshFreq()

        # Packed transfers: ONE flat array crosses the device boundary instead
        # of one transfer per level (each transfer is a round-trip on
        # remote-attached TPUs). Codes are carried as uint16 whenever every
        # codebook fits (k <= 65535 — true for every reference geometry, max
        # k 8192): on a tunneled chip the transfer seconds dominate the
        # round-trip, and uint16 halves the bytes at zero quality cost.
        self._xferDtype = np.uint16 if max(self._k) <= 0xFFFF else np.int32
        self._encodePackedJit = jax.jit(self._encodePacked)
        self._encodePackedU8Jit = jax.jit(self._encodePackedU8)

    def _putBatch(self, arr):
        """Place a leading-batch host array: sharded over the mesh's 'data'
        axis when the batch divides it, replicated on the mesh otherwise
        (correct but redundant — jit rejects mixed mesh/single placements),
        default single-device with no mesh."""
        if self._mesh is None:
            return jnp.asarray(arr)
        if arr.shape[0] % self._dataSize == 0:
            return jax.device_put(arr, self._batchSharding)
        return jax.device_put(arr, self._repSharding)

    def _encodePacked(self, variables, x):
        codes = self._module.apply(variables, x, method=self._module.encode)
        n = x.shape[0]
        dt = jnp.uint16 if self._xferDtype == np.uint16 else jnp.int32
        return jnp.concatenate([c.reshape(n, -1).astype(dt) for c in codes], axis=1)

    def _encodePackedU8(self, variables, xU8):
        # uint8 image upload: 4x fewer host->device bytes than float32 on the
        # product path (compressImage); normalization happens on device with
        # the exact arithmetic of transforms.imageToModelInput so the codes
        # are identical to the float path.
        x = (xU8.astype(jnp.float32) / 255.0 - 0.5) * 2.0
        return self._encodePacked(variables, x)

    # ------------------------------------------------------------- state mgmt
    @property
    def QuantizationParameter(self) -> str:
        return self._qp

    @QuantizationParameter.setter
    def QuantizationParameter(self, qp: str):
        self._qp = qp

    @property
    def variables(self):
        return self._variables

    def updateVariables(self, variables):
        if self._mesh is not None:
            from mcquic_tpu.parallel import replicatedShardings
            variables = jax.device_put(
                variables, replicatedShardings(self._mesh, variables))
        self._variables = variables
        self.refreshFreq()

    def refreshFreq(self):
        """Re-install frequency tables into the rANS coder (CDF cache reset)."""
        coder = self._variables.get("coder")
        if coder is not None:
            self._coder.updateFreq(_findFreqEMAs(coder))

    @property
    def coder(self) -> RansCoder:
        return self._coder

    # ----------------------------------------------------------------- codec
    def _applyVars(self):
        # setup() declares the `coder` collection, so it must be present in
        # apply even for read-only encode/decode.
        return self._variables

    def encode(self, x: np.ndarray) -> List[np.ndarray]:
        """float [-1,1] (or raw uint8) NHWC -> codes [n,m,h,w].

        uint8 inputs are reflect-padded as uint8 and normalized ON DEVICE
        (reflect-pad commutes with the affine normalize), so the upload
        crosses the tunnel at 1 byte/px instead of 4."""
        x = np.asarray(x)
        if x.dtype == np.uint8:
            x = alignedPadding(x, self._base)
            n, H, W, _ = x.shape
            packed = np.asarray(
                self._encodePackedU8Jit(self._applyVars(), self._putBatch(x)))
        else:
            x = alignedPadding(x.astype(np.float32, copy=False), self._base)
            n, H, W, _ = x.shape
            packed = np.asarray(
                self._encodePackedJit(self._applyVars(), self._putBatch(x)))
        # split the flat [n, sum(h*w*m)] back into per-level [n,m,h,w]
        shapes = self._levelShapes(H, W)
        out, cur = [], 0
        for (h, w, m) in shapes:
            size = h * w * m
            lvl = packed[:, cur:cur + size].reshape(n, h, w, m)
            out.append(np.ascontiguousarray(lvl.transpose(0, 3, 1, 2)))
            cur += size
        return out

    def _levelShapes(self, H: int, W: int) -> List[Tuple[int, int, int]]:
        """Per-level (h, w, m) for a padded input — from a trace-only
        eval_shape of encode (no compile), cached per input size."""
        cache = getattr(self, "_shapeCache", None)
        if cache is None:
            cache = self._shapeCache = {}
        key = (H, W)
        if key not in cache:
            probe = jax.eval_shape(
                partial(self._module.apply, method=self._module.encode),
                self._applyVars(), jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32))
            cache[key] = [(s.shape[1], s.shape[2], s.shape[3]) for s in probe]
        return cache[key]

    def _decodeDispatch(self, codes: Sequence[np.ndarray], toImage: bool = False):
        """Async device decode: uploads ONE packed array (single host->device
        round-trip, uint16 when every k fits — see __init__), splits
        per-level and widens to int32 on device, returns the (not yet
        fetched) device array.

        toImage=True additionally applies modelOutputToImage's exact
        clip/round/cast ON DEVICE so the restored image downloads at
        1 byte/px instead of 4 (the product decompressImage path)."""
        jits = getattr(self, "_decodePackedJits", None)
        if jits is None:
            jits = self._decodePackedJits = {}
        n = codes[0].shape[0]
        shapes = tuple((c.shape[2], c.shape[3], c.shape[1]) for c in codes)  # (h,w,m)
        packed = np.concatenate(
            [np.ascontiguousarray(np.transpose(c, (0, 2, 3, 1))).reshape(n, -1)
             for c in codes], axis=1).astype(self._xferDtype)
        fn = jits.get((shapes, toImage))
        if fn is None:
            def decodePacked(variables, packedArr, _shapes=shapes):
                packedArr = packedArr.astype(jnp.int32)  # widen on device
                nb = packedArr.shape[0]
                lst, cur = [], 0
                for (h, w, m) in _shapes:
                    sz = h * w * m
                    lst.append(packedArr[:, cur:cur + sz].reshape(nb, h, w, m))
                    cur += sz
                y = self._module.apply(variables, lst, method=self._module.decode)
                if toImage:
                    y = jnp.clip(jnp.round((y * 0.5 + 0.5) * 255.0),
                                 0, 255).astype(jnp.uint8)
                return y
            fn = jits[(shapes, toImage)] = jax.jit(decodePacked)
        return fn(self._applyVars(), self._putBatch(packed))

    def decode(self, codes: Sequence[np.ndarray]) -> np.ndarray:
        """codes [n,m,h,w] -> restored float NHWC (still padded)."""
        return np.asarray(self._decodeDispatch(codes))

    def compress(self, x: np.ndarray) -> Tuple[List[np.ndarray], List[List[bytes]], List[FileHeader]]:
        """float [-1,1] NHWC -> (codes, binaries[n][level], headers[n])
        (compressor.py:67-77)."""
        n, h, w, c = x.shape
        codes = self.encode(x)
        binaries, codeSizes = self._coder.compress(codes)
        headers = [FileHeader(mcquic_tpu.__version__, self._qp, cs,
                              ImageSize(height=h, width=w, channel=c))
                   for cs in codeSizes]
        return codes, binaries, headers

    def decompress(self, binaries: List[List[bytes]], headers: List[FileHeader]) -> np.ndarray:
        """(compressor.py:90-112): entropy-decode, decode, center-crop."""
        codes = self._coder.decompress(binaries, [h.CodeSize for h in headers])
        restored = self.decode(codes)
        ims = headers[0].ImageSize
        return centerCropTo(restored, ims.height, ims.width)

    # ------------------------------------------------------------- pipelined
    def compressMany(self, batches) -> List[Tuple[List[List[bytes]], List[FileHeader]]]:
        """Pipelined multi-batch compression: the host rANS coder for batch i
        overlaps the device encode of batch i+1 (SURVEY.md §7 hard part #2 —
        the reference serialized codes through Python lists per image,
        entropyCoder.py:120-124; here encode is dispatched async and entropy
        coding runs while the next batch computes)."""
        import queue
        import threading

        outQ: "queue.Queue" = queue.Queue()
        results: List = []
        workerError: List = []

        def ransWorker():
            while True:
                item = outQ.get()
                if item is None:
                    break
                try:
                    codesHost, shape = item
                    binaries, codeSizes = self._coder.compress(codesHost)
                    n, h, w, c = shape
                    headers = [FileHeader(mcquic_tpu.__version__, self._qp, cs,
                                          ImageSize(height=h, width=w, channel=c))
                               for cs in codeSizes]
                    results.append((binaries, headers))
                except Exception as e:  # propagate to the caller
                    workerError.append(e)
                    break

        worker = threading.Thread(target=ransWorker, daemon=True)
        worker.start()

        def fetchSplit(packedDev, paddedHW):
            packedHost = np.asarray(packedDev)
            n = packedHost.shape[0]
            out, cur = [], 0
            for (h, w, m) in self._levelShapes(*paddedHW):
                size = h * w * m
                out.append(np.ascontiguousarray(
                    packedHost[:, cur:cur + size].reshape(n, h, w, m).transpose(0, 3, 1, 2)))
                cur += size
            return out

        pending = None
        for x in batches:
            x = np.asarray(x, np.float32)
            padded = alignedPadding(x, self._base)
            packedDev = self._encodePackedJit(self._applyVars(), self._putBatch(padded))
            if pending is not None:
                prevDev, prevPaddedHW, shape = pending
                outQ.put((fetchSplit(prevDev, prevPaddedHW), shape))
            pending = (packedDev, padded.shape[1:3], x.shape)
        if pending is not None:
            prevDev, prevPaddedHW, shape = pending
            outQ.put((fetchSplit(prevDev, prevPaddedHW), shape))
        outQ.put(None)
        worker.join()
        if workerError:
            raise workerError[0]
        return results

    def decompressMany(self, items) -> List[np.ndarray]:
        """Pipelined multi-batch decompression: host rANS decode of batch i+1
        overlaps the device decode of batch i.

        items: sequence of (binaries[n][level], headers[n]) pairs.
        Returns restored images per batch (cropped to original sizes).
        """
        results: List[np.ndarray] = []
        pending = None  # (in-flight device array, headers)
        for binaries, headers in items:
            codes = self._coder.decompress(binaries, [h.CodeSize for h in headers])
            dev = self._decodeDispatch(codes)  # async: runs while host decodes next
            if pending is not None:
                prevDev, prevHeaders = pending
                ims = prevHeaders[0].ImageSize
                results.append(centerCropTo(np.asarray(prevDev), ims.height, ims.width))
            pending = (dev, headers)
        if pending is not None:
            prevDev, prevHeaders = pending
            ims = prevHeaders[0].ImageSize
            results.append(centerCropTo(np.asarray(prevDev), ims.height, ims.width))
        return results

    # -------------------------------------------------------------- wrappers
    def compressImage(self, img: np.ndarray) -> File:
        """uint8 HWC image -> `.mcq` File (demo.py:109-122).

        The raw uint8 image is uploaded (normalize-on-device, see encode) —
        4x fewer tunnel bytes than the float32 upload at identical codes."""
        _, binaries, headers = self.compress(np.asarray(img, np.uint8)[None])
        return File(headers[0], binaries[0])

    def decompressImage(self, file: File) -> np.ndarray:
        """`.mcq` File -> uint8 HWC image (demo.py:125-134).

        The clip/round/uint8 conversion runs ON DEVICE (toImage decode
        dispatch) so the restored image downloads at 1 byte/px."""
        codes = self._coder.decompress([file.Content],
                                       [file.FileHeader.CodeSize])
        restored = np.asarray(self._decodeDispatch(codes, toImage=True))
        ims = file.FileHeader.ImageSize
        return centerCropTo(restored, ims.height, ims.width)[0]
