"""High-resolution tiled coding (BASELINE.json config 3: CLIC/DIV2K 2K-4K).

XLA wants static shapes; arbitrary-size images are handled by bucketing into
fixed tiles: the image is padded to a tile grid, tiles are coded as one batch
(one jit executable per tile size, reused across all images), and the tile
grid is recorded in the container. Border continuity matches the reference's
behavior for whole images (reflect padding at edges).

Container: msgpack {grid: {rows, cols, tile, height, width}, file: <File of
the tile batch>} — readable via `TiledFile`.
"""
from dataclasses import dataclass
from typing import List, Tuple

import msgpack
import numpy as np

import mcquic_tpu
from mcquic_tpu.container import CodeSize, File, FileHeader, ImageSize
from mcquic_tpu.data.transforms import imageToModelInput, modelOutputToImage


@dataclass
class TiledFile:
    rows: int
    cols: int
    tile: int
    height: int
    width: int
    binaries: List[List[bytes]]        # per tile, per level
    codeSize: CodeSize
    qp: str = "-1"

    def serialize(self) -> bytes:
        return msgpack.packb({
            "grid": {"rows": self.rows, "cols": self.cols, "tile": self.tile,
                     "height": self.height, "width": self.width},
            "version": mcquic_tpu.__version__,
            "qp": self.qp,
            "codeSize": {"m": self.codeSize.m, "heights": self.codeSize.heights,
                         "widths": self.codeSize.widths, "k": self.codeSize.k},
            "contents": [list(levels) for levels in self.binaries],
        }, use_bin_type=True)

    @staticmethod
    def isTiled(data: bytes) -> bool:
        """Cheap prefix sniff: the tiled container is a msgpack fixmap whose
        first key is the 4-char str 'grid' (serialize() writes keys in that
        order) — no full parse of multi-MB payloads."""
        return (len(data) > 6 and 0x80 <= data[0] <= 0x8F
                and data[1:6] == b"\xa4grid")

    @staticmethod
    def deserialize(data: bytes) -> "TiledFile":
        from mcquic_tpu.utils import versionCheck

        d = msgpack.unpackb(data, raw=False)
        versionCheck(str(d.get("version", mcquic_tpu.__version__)))
        g = d["grid"]
        cs = d["codeSize"]
        return TiledFile(rows=g["rows"], cols=g["cols"], tile=g["tile"],
                         height=g["height"], width=g["width"],
                         binaries=[[bytes(b) for b in lv] for lv in d["contents"]],
                         codeSize=CodeSize(m=list(cs["m"]), heights=list(cs["heights"]),
                                           widths=list(cs["widths"]), k=list(cs["k"])),
                         qp=str(d.get("qp", "-1")))

    @property
    def BPP(self) -> float:
        total = sum(len(b) for levels in self.binaries for b in levels)
        return total * 8 / (self.height * self.width)

    def __str__(self) -> str:
        total = sum(len(b) for levels in self.binaries for b in levels)
        return (f"Tiled {self.height}x{self.width} as {self.rows}x{self.cols} "
                f"of {self.tile}px (qp {self.qp})\n"
                f"Size  : {total} B\nBPP   : {self.BPP:.4f}")


def _toTiles(img: np.ndarray, tile: int) -> Tuple[np.ndarray, int, int]:
    h, w = img.shape[:2]
    rows = -(-h // tile)
    cols = -(-w // tile)
    padH, padW = rows * tile - h, cols * tile - w
    padded = np.pad(img, [(0, padH), (0, padW), (0, 0)], mode="reflect")
    tiles = padded.reshape(rows, tile, cols, tile, 3).transpose(0, 2, 1, 3, 4)
    return tiles.reshape(rows * cols, tile, tile, 3), rows, cols


def _fromTiles(tiles: np.ndarray, rows: int, cols: int, h: int, w: int) -> np.ndarray:
    tile = tiles.shape[1]
    grid = tiles.reshape(rows, cols, tile, tile, 3).transpose(0, 2, 1, 3, 4)
    return grid.reshape(rows * tile, cols * tile, 3)[:h, :w]


def compressTiled(engine, img: np.ndarray, tile: int = 1024) -> TiledFile:
    """uint8 HWC image of any size -> TiledFile (one batched jit call)."""
    h, w = img.shape[:2]
    tiles, rows, cols = _toTiles(img, tile)
    x = imageToModelInput(tiles)
    codes, binaries, headers = engine.compress(x)
    return TiledFile(rows=rows, cols=cols, tile=tile, height=h, width=w,
                     binaries=binaries, codeSize=headers[0].CodeSize,
                     qp=str(engine.QuantizationParameter))


def decompressTiled(engine, tf: TiledFile) -> np.ndarray:
    headers = [FileHeader(mcquic_tpu.__version__, engine.QuantizationParameter,
                          tf.codeSize, ImageSize(height=tf.tile, width=tf.tile, channel=3))
               for _ in tf.binaries]
    restored = engine.decompress(tf.binaries, headers)
    return modelOutputToImage(_fromTiles(np.asarray(restored), tf.rows, tf.cols,
                                         tf.height, tf.width))
