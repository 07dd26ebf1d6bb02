"""`mcquic` command-line interface.

Parity with reference `mcquic/cli.py:34-124`: a click group whose *default*
command compresses/restores by file suffix, plus `train`, `validate`, and
`dataset` subcommands with the same flags.
"""
import logging
import pathlib

import click

import mcquic_tpu


def _banner() -> str:
    return f"mcquic_tpu {mcquic_tpu.__version__} — TPU-native multi-codebook image codec"


def _setupLogging(debug: bool, quiet: bool):
    level = logging.DEBUG if debug else (logging.WARNING if quiet else logging.INFO)
    logging.basicConfig(level=level, format="%(asctime)s %(levelname)s %(message)s")
    _enableCompileCache()


def _enableCompileCache():
    """Persistent XLA compile cache for every CLI entry (repeat runs of the
    same model/geometry skip the multi-minute TPU compiles; ~/.cache default,
    MCQUIC_JAX_CACHE overrides, empty string disables)."""
    import os
    cacheDir = os.environ.get(
        "MCQUIC_JAX_CACHE",
        os.path.join(os.path.expanduser("~/.cache/mcquic_tpu"), "jax_cache"))
    if not cacheDir:
        return
    try:
        import jax
        os.makedirs(cacheDir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cacheDir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # cache is best-effort
        pass


class DefaultGroup(click.Group):
    """Route unknown invocations to the default compress/restore command."""

    def parse_args(self, ctx, args):
        if args and args[0] not in self.commands and args[0] not in ("--help", "-h"):
            args = ["_default"] + list(args)
        return super().parse_args(ctx, args)


@click.group(cls=DefaultGroup, invoke_without_command=True, help=_banner())
@click.version_option(mcquic_tpu.__version__, "--version", "-V", message=_banner())
@click.pass_context
def entryPoint(ctx):
    if ctx.invoked_subcommand is None and not ctx.args:
        click.echo(_banner())
        click.echo(entryPoint.get_help(ctx))


@entryPoint.command("_default", hidden=True)
@click.option("-D", "--debug", is_flag=True, help="Verbose logging.")
@click.option("-q", "--quiet", is_flag=True, help="Errors only.")
@click.option("-qp", type=click.IntRange(0, 13), default=None, help="Quantization parameter (model zoo index).")
@click.option("--local", type=click.Path(exists=True, dir_okay=False), default=None,
              help="Use a local exported model instead of the zoo.")
@click.option("--disable-gpu", is_flag=True, help="Force CPU execution.")
@click.option("--mse", is_flag=True, help="Use MSE-optimized models.")
@click.option("--crop", is_flag=True, help="Center-crop input to 128-multiples.")
@click.option("--tile", type=click.IntRange(min=0), default=0,
              help="Tile size for high-resolution images (0 = whole-image; "
                   "tiled .mcq files are auto-detected on restore).")
@click.argument("input", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path))
@click.argument("output", type=click.Path(dir_okay=True, path_type=pathlib.Path), required=False)
def defaultEntry(debug, quiet, qp, local, disable_gpu, mse, crop, tile, input, output):
    """Compress IMAGE -> .mcq, or restore .MCQ -> image (reference cli.py:40-61)."""
    _setupLogging(debug, quiet)
    if disable_gpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from mcquic_tpu.demo import main
    main(qp, local, disable_gpu, mse, crop, input, output, tile=tile)


@entryPoint.command()
@click.option("-D", "--debug", is_flag=True)
@click.option("-q", "--quiet", is_flag=True)
@click.option("-r", "--resume", is_flag=True, help="Auto-resume from saveDir/latest.")
@click.option("-G", "--gen", is_flag=True, help="Train the stage-2 generation model.")
@click.argument("configPath", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path))
def train(debug, quiet, resume, gen, configpath):
    """Stage-1 codec / stage-2 generation training (reference cli.py:64-77)."""
    _setupLogging(debug, quiet)
    from mcquic_tpu.train.cli import main
    main(configpath, resume=resume, gen=gen)


@entryPoint.command()
@click.option("-D", "--debug", is_flag=True)
@click.option("-q", "--quiet", is_flag=True)
@click.option("-e", "--export", type=click.Path(path_type=pathlib.Path), default=None,
              help="Export a deploy model stripped of training state.")
@click.option("--bf16", is_flag=True,
              help="Export params as bfloat16 (half-size artifact; coder tables stay exact).")
@click.argument("path", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path))
@click.argument("images", type=click.Path(exists=True, file_okay=False, path_type=pathlib.Path),
                required=False)
def validate(debug, quiet, export, bf16, path, images):
    """Validate a checkpoint on an image folder + speed test (cli.py:80-100)."""
    _setupLogging(debug, quiet)
    from mcquic_tpu.validate.cli import main
    main(path, images, export, bf16=bf16)


@entryPoint.command()
@click.option("-D", "--debug", is_flag=True)
@click.option("-q", "--quiet", is_flag=True)
@click.option("-j", "--jobs", type=int, default=1, help="Parallel shard writers.")
@click.option("-G", "--gen", is_flag=True, help="Build image-text dataset for generation.")
@click.argument("images", type=click.Path(exists=True, file_okay=False, path_type=pathlib.Path))
@click.argument("output", type=click.Path(file_okay=False, path_type=pathlib.Path))
def dataset(debug, quiet, jobs, gen, images, output):
    """Build training shards from an image folder (cli.py:103-124)."""
    _setupLogging(debug, quiet)
    from mcquic_tpu.data.cli import main
    main(images, output, jobs=jobs, gen=gen)


@entryPoint.command()
@click.option("-D", "--debug", is_flag=True)
@click.option("-q", "--quiet", is_flag=True)
@click.option("-c", "--classes", type=str, required=True,
              help="Comma-separated ImageNet class ids to sample.")
@click.option("--cfg", type=float, default=1.5, help="Classifier-free guidance (VAR).")
@click.option("--top-k", type=int, default=0)
@click.option("--temperature", type=float, default=1.0)
@click.option("--seed", type=int, default=0)
@click.argument("modelPath", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path))
@click.argument("output", type=click.Path(file_okay=False, path_type=pathlib.Path))
def generate(debug, quiet, classes, cfg, top_k, temperature, seed, modelpath, output):
    """Sample images from a trained stage-2 generator (reference test_infer.py)."""
    _setupLogging(debug, quiet)
    from mcquic_tpu.generate import main
    main(modelpath, [int(c) for c in classes.split(",")], output,
         cfg=cfg, topK=top_k, temperature=temperature, seed=seed)


if __name__ == "__main__":
    entryPoint()
