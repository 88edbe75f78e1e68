"""Frame output: PNG (via PIL) and raw NPY dumps."""

from __future__ import annotations

import numpy as np


def save_png(path: str, img: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as PNG."""
    from PIL import Image

    Image.fromarray(np.asarray(img, dtype=np.uint8), mode="RGB").save(path)


def save_npy(path: str, img: np.ndarray) -> None:
    np.save(path, np.asarray(img))


def save_animation(frames, path: str, *, fps: float = 30.0) -> None:
    """Assemble frames into a watchable video file.

    ``frames``: iterable of (H, W, 3) uint8 arrays OR of PNG file paths.
    Format by suffix: ``.gif`` / ``.png``/``.apng`` are written with PIL
    (always available); ``.mp4``/``.webm`` shell out to ffmpeg when it is
    on PATH, else raise with a hint to use .gif.  This is the headless
    counterpart of actually *watching* the reference's canvas
    (``nbody3d.js:439-514``).
    """
    import os

    from PIL import Image

    def to_image(f):
        if isinstance(f, (str, os.PathLike)):
            return Image.open(f).convert("RGB")
        return Image.fromarray(np.asarray(f, dtype=np.uint8), mode="RGB")

    frames = list(frames)
    if not frames:
        raise ValueError("no frames to assemble")
    suffix = os.path.splitext(str(path))[1].lower()
    duration_ms = max(1, round(1000.0 / fps))

    if suffix in (".gif", ".png", ".apng"):
        imgs = [to_image(f) for f in frames]
        imgs[0].save(
            path,
            save_all=True,
            append_images=imgs[1:],
            duration=duration_ms,
            loop=0,
        )
        return
    if suffix in (".mp4", ".webm"):
        import shutil
        import subprocess
        import tempfile

        ffmpeg = shutil.which("ffmpeg")
        if ffmpeg is None:
            raise RuntimeError(
                f"ffmpeg not found on PATH (needed for {suffix}); "
                "use a .gif output instead"
            )
        with tempfile.TemporaryDirectory() as td:
            for i, f in enumerate(frames):
                to_image(f).save(os.path.join(td, f"f_{i:06d}.png"))
            subprocess.run(
                [
                    ffmpeg, "-y", "-framerate", str(fps),
                    "-i", os.path.join(td, "f_%06d.png"),
                    "-pix_fmt", "yuv420p", str(path),
                ],
                check=True,
                capture_output=True,
            )
        return
    raise ValueError(f"unsupported animation format {suffix!r} (gif/png/mp4/webm)")
