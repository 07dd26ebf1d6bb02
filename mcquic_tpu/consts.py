"""Global constants.

Mirrors the reference `mcquic/consts.py:8-27` capability surface (name, eps,
temp dir with atexit cleanup) without copying its implementation.
"""
import atexit
import shutil
import tempfile
from pathlib import Path


class _Consts:
    Name = "mcquic"
    # Numerical floor used across quantizer / GDN / frequency logic.
    Eps = 1e-6
    # Communication timeout (seconds) for host-side coordination.
    TimeOut = 15 * 60

    _tempDir = None

    @property
    def TempDir(self) -> str:
        if self._tempDir is None:
            self._tempDir = tempfile.mkdtemp(prefix="mcquic_tpu_")

            def _cleanup(path=self._tempDir):
                shutil.rmtree(path, ignore_errors=True)

            atexit.register(_cleanup)
        return self._tempDir

    @property
    def CDot(self) -> str:
        return "·"

    @property
    def TempPath(self) -> Path:
        return Path(self.TempDir)


Consts = _Consts()
