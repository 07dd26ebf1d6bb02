"""Stage-2 sampling app (reference `test_infer.py:13-44`): load a generator
checkpoint, sample images for the given ImageNet classes, save PNGs."""
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import mcquic_tpu.models.generator  # noqa: F401  (populates GeneratorRegistry)
import mcquic_tpu.models.generator_var  # noqa: F401
from mcquic_tpu.config import Config
from mcquic_tpu.data.transforms import modelOutputToImage
from mcquic_tpu.train.saver import loadTree, upcastBf16
from mcquic_tpu.utils.registry import GeneratorRegistry

logger = logging.getLogger("mcquic_tpu.generate")


def loadGenerator(path: Path):
    tree, meta = loadTree(path)
    tree = upcastBf16(tree)  # bf16 deploy exports sample as fp32
    if meta is None or "config" not in meta:
        raise RuntimeError(f"{path} lacks config metadata")
    config = Config.deserialize(meta["config"])
    from mcquic_tpu.train.genTrainer import constructGenerator
    params = dict(config.Model.Params)
    params.pop("loadFrom", None)
    module = constructGenerator(config.Model.Key, params)
    variables = {"params": tree["params"], "coder": tree.get("coder", {})}
    return module, variables


def main(modelPath, classIds, outputDir, cfg: float = 1.5, topK: int = 0,
         temperature: float = 1.0, seed: int = 0):
    module, variables = loadGenerator(Path(modelPath))
    outputDir = Path(outputDir)
    outputDir.mkdir(parents=True, exist_ok=True)

    condition = jnp.asarray(classIds, jnp.int32)
    rng = jax.random.PRNGKey(seed)
    kwargs = {}
    if type(module).__name__ == "GeneratorVAR":
        predictions, restored = module.apply(
            variables, condition, rng, cfg=cfg, topK=topK, method=module.generate)
    else:
        predictions, restored = module.apply(
            variables, condition, rng=rng, temperature=temperature, topK=topK,
            method=module.generate)

    from PIL import Image
    images = modelOutputToImage(np.asarray(restored))
    outputs = []
    for i, (cid, img) in enumerate(zip(classIds, images)):
        out = outputDir / f"class{cid}_{i}.png"
        Image.fromarray(img).save(out)
        outputs.append(out)
        logger.info("sampled class %d -> %s", cid, out)
    return outputs
