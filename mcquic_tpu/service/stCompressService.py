"""Streamlit web demo (reference `mcquic/service/stCompressService.py`).

Upload an image → compress to `.mcq` → download; upload `.mcq` → restore.
Run with:  streamlit run -m mcquic_tpu.service.stCompressService
Gated: streamlit is optional; raises a helpful error when missing.
"""
import io
import os
from pathlib import Path

import numpy as np

try:
    import streamlit as st
except ImportError as e:  # pragma: no cover
    raise RuntimeError("Install streamlit to run the web demo.") from e

from mcquic_tpu.container import File
from mcquic_tpu.demo import loadModel

MAX_PIXELS = 3000 * 3000  # HF-space style size guard (reference :112-121)


@st.cache_resource
def _engine():
    local = os.environ.get("MCQUIC_MODEL")
    qp = int(os.environ.get("MCQUIC_QP", "2"))
    return loadModel(qp=qp, local=local)


def main():
    st.title("McQuic-TPU — neural image codec")
    upload = st.file_uploader("Image (png/jpg) to compress, or .mcq to restore")
    if upload is None:
        return
    engine = _engine()
    name = upload.name
    data = upload.read()
    if name.endswith(".mcq"):
        from mcquic_tpu.models.tiling import TiledFile, decompressTiled
        if TiledFile.isTiled(data):
            tf = TiledFile.deserialize(data)
            st.text(str(tf))
            restored = decompressTiled(engine, tf)
        else:
            file = File.deserialize(data)
            st.text(str(file))
            restored = engine.decompressImage(file)
        st.image(restored)
        buf = io.BytesIO()
        from PIL import Image
        Image.fromarray(restored).save(buf, format="PNG")
        st.download_button("Download restored PNG", buf.getvalue(),
                           file_name=Path(name).stem + ".png")
    else:
        from PIL import Image
        img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        if img.shape[0] * img.shape[1] > MAX_PIXELS:
            st.error(f"Image too large (> {MAX_PIXELS} pixels).")
            return
        file = engine.compressImage(img)
        st.text(str(file))
        st.download_button("Download .mcq", file.serialize(),
                           file_name=Path(name).stem + ".mcq")
        restored = engine.decompressImage(file)
        st.image(restored, caption="decoded preview")


if __name__ == "__main__":
    main()
