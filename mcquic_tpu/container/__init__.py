"""`.mcq` container format.

Parity with reference `mcquic/utils/specification.py:22-183`: the serialized
msgpack layout is identical (`fileHeader{qp, version, codeSize{m,heights,
widths,k}, imageSize{height,width,channel}}, contents[bytes]`), so files are
cross-readable between the reference and this build.
"""
from dataclasses import dataclass
from typing import List, Union

import msgpack

from mcquic_tpu.utils import versionCheck


@dataclass
class ImageSize:
    """Image size spec (specification.py:56-74)."""
    height: int
    width: int
    channel: int

    @property
    def Pixels(self) -> int:
        return self.height * self.width

    def __str__(self) -> str:
        return f"[{self.width}x{self.height}, {self.channel}]"


@dataclass
class CodeSize:
    """Latent code spec (specification.py:77-97). Per-level m/h/w/k lists."""
    m: List[int]
    heights: List[int]
    widths: List[int]
    k: List[int]

    def __str__(self) -> str:
        sequence = ", ".join(f"[{w}x{h}, {k}]x{m}"
                             for h, w, k, m in zip(self.heights, self.widths, self.k, self.m))
        return f"{self.m} code-groups: {sequence}"


@dataclass(init=False)
class FileHeader:
    """(specification.py:100-134)."""
    qp: str
    version: str
    codeSize: CodeSize
    imageSize: ImageSize

    def __init__(self, version: str, qp: str, codeSize: CodeSize, imageSize: ImageSize):
        if versionCheck(version):
            self.qp = qp
            self.version = version
            self.codeSize = codeSize
            self.imageSize = imageSize

    @property
    def QuantizationParameter(self) -> str:
        return str(self.qp)

    @property
    def Version(self) -> str:
        return self.version

    @property
    def CodeSize(self) -> CodeSize:
        return self.codeSize

    @property
    def ImageSize(self) -> ImageSize:
        return self.imageSize

    def __str__(self) -> str:
        return (f"\n    Version    : {self.Version}"
                f"\n    QP         : {self.QuantizationParameter}"
                f"\n    Image size : {self.ImageSize}"
                f"\n    Code size  : {self.CodeSize}")


def _headerToDict(h: FileHeader) -> dict:
    return {
        "qp": h.qp,
        "version": h.version,
        "codeSize": {"m": list(h.codeSize.m), "heights": list(h.codeSize.heights),
                     "widths": list(h.codeSize.widths), "k": list(h.codeSize.k)},
        "imageSize": {"height": h.imageSize.height, "width": h.imageSize.width,
                      "channel": h.imageSize.channel},
    }


def _headerFromDict(d: dict) -> FileHeader:
    cs = d["codeSize"]
    ims = d["imageSize"]
    return FileHeader(
        version=d["version"], qp=d["qp"],
        codeSize=CodeSize(m=list(cs["m"]), heights=list(cs["heights"]),
                          widths=list(cs["widths"]), k=list(cs["k"])),
        imageSize=ImageSize(height=ims["height"], width=ims["width"], channel=ims["channel"]),
    )


@dataclass
class File:
    """Header + per-level binaries, msgpack round-trip (specification.py:136-183)."""
    fileHeader: FileHeader
    contents: List[bytes]

    @property
    def FileHeader(self) -> FileHeader:
        return self.fileHeader

    @property
    def Content(self) -> List[bytes]:
        return self.contents

    def serialize(self) -> bytes:
        payload = {"fileHeader": _headerToDict(self.fileHeader),
                   "contents": list(self.contents)}
        return msgpack.packb(payload, use_bin_type=True)

    @staticmethod
    def deserialize(data: bytes) -> "File":
        payload = msgpack.unpackb(data, use_list=True, raw=False)
        return File(fileHeader=_headerFromDict(payload["fileHeader"]),
                    contents=[bytes(c) for c in payload["contents"]])

    @property
    def BPP(self) -> float:
        return sum(len(x) for x in self.contents) * 8 / self.FileHeader.ImageSize.Pixels

    def size(self, human: bool = False) -> Union[int, str]:
        total = sum(len(x) for x in self.contents)
        if not human:
            return total
        for unit in ("B", "KiB", "MiB", "GiB"):
            if total < 1024:
                return f"{total:.2f} {unit}"
            total /= 1024
        return f"{total:.2f} TiB"

    def __str__(self) -> str:
        return f"Header: {self.fileHeader}\nSize  : {self.size(True)}\nBPP   : {self.BPP:.4f}"

    def __hash__(self) -> int:
        return hash(self.serialize())
