"""Host-side entropy-coding engine: frequency tables → CDFs → rANS streams.

Parity with reference `mcquic/modules/entropyCoder.py`:
  * per-level `[m, k]` frequency EMA (maintained in-graph by the quantizer's
    `coder` collection; see models/quantizer.py) feeds lazily-rebuilt
    quantized CDFs (`entropyCoder.py:50-63`),
  * `compress` / `decompress` map code tensors `[n, m, h, w]` per level to
    per-image per-level rANS byte streams (`entropyCoder.py:95-154`) — the
    real rANS path that the reference left disabled (`entropyCoder.py:17`),
    repaired here per BASELINE.json's north star.

TPU-first difference: codes cross the device→host boundary as single numpy
arrays per level (async device transfer), and all images of a level are
encoded in one native batch call — not per-symbol Python lists
(`entropyCoder.py:120-124`).
"""
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mcquic_tpu.coding import rans
from mcquic_tpu.container import CodeSize

PRECISION = 16


class RansCoder:
    """Entropy coder over per-level frequency tables.

    Args:
        m: groups per level; k: codewords per level.
    """

    def __init__(self, m: Sequence[int], k: Sequence[int], mode: str = "rans"):
        """mode: 'rans' (the repaired v1 product path) or 'plain' (raw int64
        bytes, byte-compatible with the reference's active VariousMCoder,
        entropyCoder.py:401/421)."""
        assert mode in ("rans", "plain")
        self._mode = mode
        self._m = [int(x) for x in m]
        self._k = [int(x) for x in k]
        self._freq: Optional[List[np.ndarray]] = None
        self._cdfMats: Optional[List[np.ndarray]] = None
        self._cdfSizes: Optional[List[np.ndarray]] = None
        self._luts: Optional[List[Optional[np.ndarray]]] = None

    # ------------------------------------------------------------ freq / cdf
    def updateFreq(self, freqEMA: Sequence[np.ndarray]):
        """Install new per-level [m,k] frequency tables; invalidates CDFs."""
        assert len(freqEMA) == len(self._k), "level count mismatch"
        self._freq = [np.asarray(f, dtype=np.float64) for f in freqEMA]
        self._cdfMats = None
        self._cdfSizes = None
        self._luts = None

    @property
    def NormalizedFreq(self) -> List[np.ndarray]:
        if self._freq is None:
            # uniform init, matching reference ctor (entropyCoder.py:299)
            self._freq = [np.full((mi, ki), 1.0 / ki) for mi, ki in zip(self._m, self._k)]
        return [f / f.sum(-1, keepdims=True) for f in self._freq]

    def _ensureCdfs(self, needLuts: bool = False):
        if self._cdfMats is None:
            cdfMats, cdfSizes = [], []
            for freq, ki in zip(self.NormalizedFreq, self._k):
                # stride ki+2: reference passes cdfSizes=k+2 so the escape
                # sentinel never fires for in-range codes (entropyCoder.py:121).
                mat = np.zeros((freq.shape[0], ki + 2), dtype=np.int32)
                for mIdx in range(freq.shape[0]):
                    cdf = rans.pmfToQuantizedCDF(freq[mIdx].astype(np.float32).tolist(), PRECISION)
                    mat[mIdx, :ki + 1] = cdf
                    mat[mIdx, ki + 1] = 1 << PRECISION
                cdfMats.append(mat)
                cdfSizes.append(np.full(freq.shape[0], ki + 2, dtype=np.int32))
            self._cdfMats = cdfMats
            self._cdfSizes = cdfSizes
            self._luts = [None] * len(self._k)
        if needLuts:
            for lv in range(len(self._k)):
                if self._luts[lv] is None:
                    self._luts[lv] = rans.buildDecodeLuts(self._cdfMats[lv], self._cdfSizes[lv])

    @property
    def CDFs(self) -> List[List[List[int]]]:
        """Reference-compatible nested-list CDFs (entropyCoder.py:344-347)."""
        self._ensureCdfs()
        return [[row[:ki + 1].tolist() for row in mat]
                for mat, ki in zip(self._cdfMats, self._k)]

    # --------------------------------------------------------------- streams
    def compress(self, codes: List[np.ndarray]) -> Tuple[List[List[bytes]], List[CodeSize]]:
        """codes: per level [n, m, h, w] ints -> (binaries[n][level], CodeSize[n])."""
        n = codes[0].shape[0]
        heights, widths = [], []
        compressed: List[List[bytes]] = [[] for _ in range(n)]
        if self._mode == "plain":
            for code in codes:
                _, mi, h, w = code.shape
                heights.append(h)
                widths.append(w)
                arr = np.ascontiguousarray(code, dtype=np.int64)
                for i in range(n):
                    compressed[i].append(arr[i].tobytes())
            return compressed, [CodeSize(list(self._m), heights, widths, list(self._k))
                                for _ in range(n)]
        self._ensureCdfs()
        for lv, code in enumerate(codes):
            _, mi, h, w = code.shape
            heights.append(h)
            widths.append(w)
            # Symbol order is the C-flattened [m, h, w] walk (entropyCoder.py:120).
            indexes = np.repeat(np.arange(mi, dtype=np.int32), h * w)
            offsets = np.zeros(mi, dtype=np.int32)
            flat = np.ascontiguousarray(code.reshape(n, mi * h * w), dtype=np.int32)
            binaries = rans.encodeBatchNp(flat, indexes, self._cdfMats[lv],
                                          self._cdfSizes[lv], offsets)
            for i in range(n):
                compressed[i].append(binaries[i])
        codeSizes = [CodeSize(list(self._m), heights, widths, list(self._k)) for _ in range(n)]
        return compressed, codeSizes

    def decompress(self, binaries: List[List[bytes]], codeSizes: List[CodeSize]) -> List[np.ndarray]:
        """binaries[n][level] -> per level [n, m, h, w] int32."""
        levels = len(binaries[0])
        out: List[np.ndarray] = []
        cs = codeSizes[0]
        if self._mode == "plain":
            for lv in range(levels):
                mi, h, w = cs.m[lv], cs.heights[lv], cs.widths[lv]
                decoded = np.stack([np.frombuffer(b[lv], dtype=np.int64).reshape(mi, h, w)
                                    for b in binaries])
                out.append(decoded.astype(np.int32))
            return out
        self._ensureCdfs(needLuts=True)
        for lv in range(levels):
            mi, h, w = cs.m[lv], cs.heights[lv], cs.widths[lv]
            indexes = np.repeat(np.arange(mi, dtype=np.int32), h * w)
            offsets = np.zeros(mi, dtype=np.int32)
            streams = [b[lv] for b in binaries]
            decoded = rans.decodeBatchNp(streams, indexes, self._cdfMats[lv],
                                         self._cdfSizes[lv], offsets, luts=self._luts[lv])
            out.append(decoded.reshape(len(binaries), mi, h, w))
        return out
