"""Reference (PyTorch) checkpoint → flax params conversion.

Maps the reference McQuic state-dict naming (mcquic/modules/compressor.py
`Compressor`, NCHW/OIHW tensors) onto this build's flax tree (NHWC/HWIO).
Enables RD-parity evaluation with reference-trained weights (BASELINE.json
north star) without any torch dependency at inference time — conversion is a
one-shot offline step.

Name map summary (v1 `Compressor`):
    _encoder.N.*                       -> _encoder/<Block>_i/...
    _decoder.N.*                       -> _decoder/<Block>_i/...
    _quantizer._encoders.L._latentStageEncoder.N.* -> _quantizer/_latentStageEncoders_L/...
    _quantizer._encoders.L._quantizer._codebook    -> _quantizer/codebookL
    _quantizer._encoders.L._quantizer._temperature -> _quantizer/temperatureL
    _quantizer._decoders.L.{_dequantizationHead,_sideHead,_restoreHead}.N.*
    _quantizer._entropyCoder._freqEMA.L            -> coder/_quantizer/freqEMAL

Tensor transforms: conv OIHW->HWIO; 1x1 "linear" convs likewise; GDN
beta/gamma stay in reparam space (identical NonNegativeParametrizer);
temperature [m,1,1,1]->[m]; codebook [m,k,d] unchanged.
"""
from typing import Callable, Dict, List, Tuple

import numpy as np

TORCH_SILU = object()  # marker: no params


def _convW(w):
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


class _Map:
    """Accumulates (flaxPath tuple) -> (torchKey, transform)."""

    def __init__(self):
        self.entries: Dict[Tuple[str, ...], Tuple[str, Callable]] = {}

    def add(self, flaxPath, torchKey, fn=lambda x: x):
        assert flaxPath not in self.entries, f"dup flax path {flaxPath}"
        self.entries[flaxPath] = (torchKey, fn)

    def conv(self, flaxPrefix, torchPrefix, bias=True):
        # flax wrapper Conv module contains an inner nn.Conv named Conv_0
        self.add((*flaxPrefix, "Conv_0", "kernel"), f"{torchPrefix}.weight", _convW)
        if bias:
            self.add((*flaxPrefix, "Conv_0", "bias"), f"{torchPrefix}.bias")

    def gdn(self, flaxPrefix, torchPrefix):
        self.add((*flaxPrefix, "beta"), f"{torchPrefix}.beta")
        # reference gamma [cOut, cIn/groups] -> ours [g, cg, cgOut]: for g=1
        # reference stores [c, c] (out, in); ours [1, in, out]
        self.add((*flaxPrefix, "gamma"), f"{torchPrefix}.gamma",
                 lambda g: np.transpose(g, (1, 0))[None])

    def residualBlock(self, flaxPrefix, torchPrefix, denseNorm=False, skip=False):
        self.conv((*flaxPrefix, "Conv_0"), f"{torchPrefix}._branch.1")
        if denseNorm:
            self.add((*flaxPrefix, "GroupNorm_0", "scale"), f"{torchPrefix}._branch.2.weight")
            self.add((*flaxPrefix, "GroupNorm_0", "bias"), f"{torchPrefix}._branch.2.bias")
        self.conv((*flaxPrefix, "Conv_1"), f"{torchPrefix}._branch.3")
        if skip:
            self.conv((*flaxPrefix, "Conv_2"), f"{torchPrefix}._skip")

    def residualBlockStride(self, flaxPrefix, torchPrefix):
        self.conv((*flaxPrefix, "Conv_0"), f"{torchPrefix}._branch.1")
        self.gdn((*flaxPrefix, "GenDivNorm_0"), f"{torchPrefix}._branch.2")
        self.conv((*flaxPrefix, "Conv_1"), f"{torchPrefix}._branch.3")
        self.conv((*flaxPrefix, "Conv_2"), f"{torchPrefix}._skip")

    def residualBlockShuffle(self, flaxPrefix, torchPrefix):
        # branch pixel-shuffle conv is Sequential(conv, PixelShuffle) -> .0
        self.conv((*flaxPrefix, "PixelShuffleConv_0"), f"{torchPrefix}._branch.1.0")
        self.gdn((*flaxPrefix, "InvGenDivNorm_0"), f"{torchPrefix}._branch.2")
        self.conv((*flaxPrefix, "Conv_0"), f"{torchPrefix}._branch.3")
        self.conv((*flaxPrefix, "PixelShuffleConv_1"), f"{torchPrefix}._skip.0")

    def attentionBlock(self, flaxPrefix, torchPrefix, denseNorm=False):
        for j in range(3):
            self.residualBlock((*flaxPrefix, f"ResidualBlock_{j}"),
                               f"{torchPrefix}._mainBranch.{j}", denseNorm)
        for j in range(3):
            self.residualBlock((*flaxPrefix, f"ResidualBlock_{3 + j}"),
                               f"{torchPrefix}._sideBranch.{j}", denseNorm)
        self.conv((*flaxPrefix, "Conv_0"), f"{torchPrefix}._sideBranch.3")


def buildCompressorMap(channel: int, m: int, k: List[int]) -> _Map:
    """Name map for the v1 `Compressor` (reference compressor.py:120-177)."""
    mp = _Map()
    # ---- encoder (compressor.py:122-131)
    e = ("params", "_encoder")
    mp.conv((*e, "Conv_0"), "_encoder.0")
    mp.residualBlock((*e, "ResidualBlock_0"), "_encoder.1")
    mp.residualBlockStride((*e, "ResidualBlockWithStride_0"), "_encoder.2")
    mp.attentionBlock((*e, "AttentionBlock_0"), "_encoder.3")
    mp.residualBlock((*e, "ResidualBlock_1"), "_encoder.4")
    mp.residualBlockStride((*e, "ResidualBlockWithStride_1"), "_encoder.5")
    mp.residualBlock((*e, "ResidualBlock_2"), "_encoder.6")
    # ---- decoder (compressor.py:132-140)
    d = ("params", "_decoder")
    mp.residualBlock((*d, "ResidualBlock_0"), "_decoder.0")
    mp.residualBlockShuffle((*d, "ResidualBlockShuffle_0"), "_decoder.1")
    mp.attentionBlock((*d, "AttentionBlock_0"), "_decoder.2")
    mp.residualBlock((*d, "ResidualBlock_1"), "_decoder.3")
    mp.residualBlockShuffle((*d, "ResidualBlockShuffle_1"), "_decoder.4")
    mp.residualBlock((*d, "ResidualBlock_2"), "_decoder.5")
    mp.conv((*d, "PixelShuffleConv_0"), "_decoder.6.0")
    # ---- quantizer levels (compressor.py:141-176 head factories)
    q = ("params", "_quantizer")
    for lv in range(len(k)):
        tq = f"_quantizer._encoders.{lv}"
        mp.add((*q, f"codebook{lv}"), f"{tq}._quantizer._codebook")
        mp.add((*q, f"temperature{lv}"), f"{tq}._quantizer._temperature",
               lambda t: np.asarray(t).reshape(-1))
        lse = (*q, f"_latentStageEncoders_{lv}")
        mp.residualBlockStride((*lse, "ResidualBlockWithStride_0"),
                               f"{tq}._latentStageEncoder.0")
        mp.residualBlock((*lse, "ResidualBlock_0"), f"{tq}._latentStageEncoder.1")
        mp.attentionBlock((*lse, "AttentionBlock_0"), f"{tq}._latentStageEncoder.2")
        qh = (*q, f"_quantizationHeads_{lv}")
        mp.residualBlock((*qh, "ResidualBlock_0"), f"{tq}._quantizationHead.0")
        mp.attentionBlock((*qh, "AttentionBlock_0"), f"{tq}._quantizationHead.1")
        mp.conv((*qh, "Conv_0"), f"{tq}._quantizationHead.2")
        if lv < len(k) - 1:
            lh = (*q, f"_latentHeads_{lv}")
            mp.residualBlock((*lh, "ResidualBlock_0"), f"{tq}._latentHead.0")
            mp.attentionBlock((*lh, "AttentionBlock_0"), f"{tq}._latentHead.1")
            mp.conv((*lh, "Conv_0"), f"{tq}._latentHead.2")
        td = f"_quantizer._decoders.{lv}"
        dh = (*q, f"_dequantizationHeads_{lv}")
        mp.attentionBlock((*dh, "AttentionBlock_0"), f"{td}._dequantizationHead.0")
        mp.conv((*dh, "Conv_0"), f"{td}._dequantizationHead.1")
        mp.residualBlock((*dh, "ResidualBlock_0"), f"{td}._dequantizationHead.2")
        if lv < len(k) - 1:
            sh = (*q, f"_sideHeads_{lv}")
            mp.attentionBlock((*sh, "AttentionBlock_0"), f"{td}._sideHead.0")
            mp.conv((*sh, "Conv_0"), f"{td}._sideHead.1")
            mp.residualBlock((*sh, "ResidualBlock_0"), f"{td}._sideHead.2")
        rh = (*q, f"_restoreHeads_{lv}")
        mp.attentionBlock((*rh, "AttentionBlock_0"), f"{td}._restoreHead.0")
        mp.residualBlock((*rh, "ResidualBlock_0"), f"{td}._restoreHead.1")
        mp.residualBlockShuffle((*rh, "ResidualBlockShuffle_0"), f"{td}._restoreHead.2")
    # ---- freqEMA (entropy coder state)
    for lv in range(len(k)):
        mp.add(("coder", "_quantizer", f"freqEMA{lv}"),
               f"_quantizer._entropyCoder._freqEMA.{lv}")
    return mp


def buildNeonMap(channel: int, k: int, size: List[int], denseNorm: bool = False) -> _Map:
    """Name map for the v2 `Neon` tokenizer (reference compressor.py:181-233 +
    ResidualBackwardQuantizer, quantizer.py:577-765)."""
    mp = _Map()
    dn = denseNorm
    # ---- encoder (compressor.py:186-207): 16 sequential stages
    e = ("params", "_encoder")
    mp.conv((*e, "Conv_0"), "_encoder.0")
    mp.attentionBlock((*e, "AttentionBlock_0"), "_encoder.1", dn)
    encResIdx = [2, 3, 5, 7, 10, 11, 12, 13, 14]
    for fi, ti in enumerate(encResIdx):
        mp.residualBlock((*e, f"ResidualBlock_{fi}"), f"_encoder.{ti}", dn,
                         skip=ti in (10, 14))  # channel changes at .10 and .14
    for fi, ti in enumerate([4, 6, 8]):
        mp.residualBlockStride((*e, f"ResidualBlockWithStride_{fi}"), f"_encoder.{ti}")
    mp.attentionBlock((*e, "AttentionBlock_1"), "_encoder.9", dn)
    mp.attentionBlock((*e, "AttentionBlock_2"), "_encoder.15", dn)
    # ---- decoder (compressor.py:208-228): 17 sequential stages
    d = ("params", "_decoder")
    mp.attentionBlock((*d, "AttentionBlock_0"), "_decoder.0", dn)
    decResIdx = [1, 2, 3, 4, 5, 7, 9, 11, 13, 14]
    for fi, ti in enumerate(decResIdx):
        mp.residualBlock((*d, f"ResidualBlock_{fi}"), f"_decoder.{ti}", dn,
                         skip=ti in (1, 5))  # channel changes at .1 and .5
    for fi, ti in enumerate([8, 10, 12]):
        mp.residualBlockShuffle((*d, f"ResidualBlockShuffle_{fi}"), f"_decoder.{ti}")
    mp.attentionBlock((*d, "AttentionBlock_1"), "_decoder.6", dn)
    mp.attentionBlock((*d, "AttentionBlock_2"), "_decoder.15", dn)
    mp.conv((*d, "Conv_0"), "_decoder.16")
    # ---- quantizer (shared codebook + per-level stacks)
    q = ("params", "_quantizer")
    L = len(size)
    mp.add((*q, "codebook"), "_quantizer._quantizers.0._codebook")
    # temperature stacked [L, 1] from per-level [1,1,1,1] params — handled in
    # convertNeon directly (multi-source); freqEMA likewise.
    lastSize = size[0] * 2
    for i, thisSize in enumerate(size):
        halving = thisSize == lastSize // 2
        lastSize = thisSize
        enc = (*q, f"_encoders_{i}")
        tq = f"_quantizer._encoders.{i}"
        mp.residualBlock((*enc, "ResidualBlock_0"), f"{tq}.0", dn, skip=True)  # ch->4ch
        mp.attentionBlock((*enc, "AttentionBlock_0"), f"{tq}.1", dn)
        if halving:
            mp.residualBlockStride((*enc, "ResidualBlockWithStride_0"), f"{tq}.2")
        else:
            mp.residualBlock((*enc, "ResidualBlock_1"), f"{tq}.2", dn)
        mp.conv((*enc, "Conv_0"), f"{tq}.3", bias=False)

        def upStack(flaxBase, torchBase):
            mp.conv((*flaxBase, "Conv_0"), f"{torchBase}.0", bias=False)
            if halving:
                mp.residualBlockShuffle((*flaxBase, "ResidualBlockShuffle_0"),
                                        f"{torchBase}.1")
                lastRes = "ResidualBlock_0"
            else:
                mp.residualBlock((*flaxBase, "ResidualBlock_0"), f"{torchBase}.1", dn)
                lastRes = "ResidualBlock_1"
            mp.attentionBlock((*flaxBase, "AttentionBlock_0"), f"{torchBase}.2", dn)
            mp.residualBlock((*flaxBase, lastRes), f"{torchBase}.3", dn, skip=True)  # 4ch->ch

        if i < L - 1:
            upStack((*q, f"_backwards_{i}"), f"_quantizer._backwards.{i}")
        upStack((*q, f"_decoders_{i}"), f"_quantizer._decoders.{i}")
    return mp


def convertNeon(stateDict: Dict[str, np.ndarray], channel: int, k: int,
                size: List[int], denseNorm: bool = False, strict: bool = True) -> dict:
    """torch Neon state-dict -> flax variables {'params', 'coder'}."""
    mp = buildNeonMap(channel, k, size, denseNorm)
    out: dict = {}
    missing = []
    for flaxPath, (torchKey, fn) in mp.entries.items():
        if torchKey not in stateDict:
            missing.append(torchKey)
            continue
        node = out
        for p in flaxPath[:-1]:
            node = node.setdefault(p, {})
        node[flaxPath[-1]] = fn(np.asarray(stateDict[torchKey]))
    if strict and missing:
        raise KeyError(f"{len(missing)} reference keys missing, e.g. {missing[:5]}")
    L = len(size)
    # stacked temperature [L, 1]: our row lv corresponds to processed order
    # (0 = smallest scale) = reference construction index L-1-lv
    temps = [np.asarray(stateDict[f"_quantizer._quantizers.{L - 1 - lv}._temperature"]).reshape(-1)
             for lv in range(L)]
    out["params"]["_quantizer"]["temperature"] = np.stack(temps)
    # stacked freqEMA [L, 1, k]: entropy-coder order is small->large
    freqs = [np.asarray(stateDict[f"_quantizer._entropyCoder._freqEMA.{i}"])
             for i in range(L)]
    out.setdefault("coder", {})["_quantizer"] = {"freqEMA": np.stack(freqs)}
    return out


def convertCompressor(stateDict: Dict[str, np.ndarray], channel: int, m: int,
                      k: List[int], strict: bool = True) -> dict:
    """torch state-dict -> flax variables {'params':..., 'coder':...}."""
    mp = buildCompressorMap(channel, m, k)
    out: dict = {}
    missing = []
    for flaxPath, (torchKey, fn) in mp.entries.items():
        if torchKey not in stateDict:
            missing.append(torchKey)
            continue
        node = out
        for p in flaxPath[:-1]:
            node = node.setdefault(p, {})
        node[flaxPath[-1]] = fn(np.asarray(stateDict[torchKey]))
    if strict and missing:
        raise KeyError(f"{len(missing)} reference keys missing, e.g. {missing[:5]}")
    out.setdefault("coder", {})
    return out


def loadTorchStateDict(path) -> Dict[str, np.ndarray]:
    """torch checkpoint file -> flat numpy state dict. Accepts raw state
    dicts, reference trainer checkpoints ({'trainer': {'_model': ...}} with
    the `module._compressor.` prefix) and exported {'model': ...} files."""
    import torch

    raw = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "trainer" in raw:
        sd = stripTrainerPrefix(raw["trainer"]["_model"])
    elif isinstance(raw, dict) and "model" in raw:
        sd = raw["model"]
    else:
        sd = raw
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def stripTrainerPrefix(stateDict: Dict[str, np.ndarray],
                       prefix: str = "module._compressor.") -> Dict[str, np.ndarray]:
    """Reference trainer checkpoints prefix model params with
    `module._compressor.` (validate/cli.py:40-43); strip + drop lpips."""
    return {key[len(prefix):]: value for key, value in stateDict.items()
            if key.startswith(prefix) and "_lpips" not in key}


def expectedTorchKeys(channel: int, m: int, k: List[int]) -> List[str]:
    return [tk for tk, _ in buildCompressorMap(channel, m, k).entries.values()]


def main():
    """CLI: convert a reference torch checkpoint into an exported model.

    v1 geometry:   python -m mcquic_tpu.utils.convert ref.ckpt out.npz \
                       --channel 128 --m 2 --k 8192,2048,512 --qp 2
    Neon geometry: ... --channel 256 --k 4096 --size 16,8,8,... (single k)
    Or read geometry from a training yaml: ... --config cfg.yaml
    """
    import argparse

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("ckpt")
    parser.add_argument("out")
    parser.add_argument("--config", type=str, default=None,
                        help="training yaml to read model geometry from")
    parser.add_argument("--channel", type=int, default=None)
    parser.add_argument("--m", type=int, default=None)
    parser.add_argument("--k", type=str, default=None, help="comma-separated")
    parser.add_argument("--size", type=str, default=None,
                        help="comma-separated Neon scale pyramid")
    parser.add_argument("--denseNorm", action="store_true")
    parser.add_argument("--qp", type=str, default="-1")
    args = parser.parse_args()

    from mcquic_tpu.config import Config
    from mcquic_tpu.train.saver import exportModel

    if args.config:
        cfgIn = Config.load(args.config)
        params = dict(cfgIn.Model.Params)
        channel = params.get("channel")
        kParam = params.get("k")
        size = list(params.get("size") or []) or None
        m = params.get("m", 1)
        # legacy configs carry uniform list m (e.g. neon.yaml m: [1]*5)
        if isinstance(m, (list, tuple)):
            if len(set(m)) != 1:
                parser.error(f"per-level m {m} is not supported (must be uniform)")
            m = m[0]
        m = int(m)
        denseNorm = bool(params.get("denseNorm", False))
    else:
        channel = args.channel
        kParam = [int(x) for x in args.k.split(",")] if args.k else None
        size = [int(x) for x in args.size.split(",")] if args.size else None
        m = args.m
        denseNorm = args.denseNorm
    # validate geometry args BEFORE the (potentially multi-GB) checkpoint load
    if channel is None or kParam is None:
        parser.error("provide --config or --channel/--k")
    channel = int(channel)
    if not size and m is None:
        parser.error("--m is required for v1 geometry")

    sd = loadTorchStateDict(args.ckpt)
    if size:  # Neon geometry (reference stage-1 semantics)
        k = int(kParam[0]) if isinstance(kParam, list) else int(kParam)
        variables = convertNeon(sd, channel, k, size, denseNorm)
        modelCfg = {"key": "Neon", "params": {
            "channel": channel, "k": int(k), "size": size,
            "denseNorm": denseNorm}}
    else:
        k = [int(x) for x in kParam] if isinstance(kParam, list) else [int(kParam)]
        variables = convertCompressor(sd, channel, int(m), k)
        modelCfg = {"key": "Compressor", "params": {
            "channel": channel, "m": int(m), "k": k}}
    cfg = Config.deserialize({"model": modelCfg})
    final = exportModel(args.out, variables, cfg.serialize(), qp=args.qp)
    print(final)


if __name__ == "__main__":
    main()
