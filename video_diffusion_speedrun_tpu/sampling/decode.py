"""Decoded-video post-processing and writing.

Semantics of `/root/reference/sampling/decoder.py:33-53`: [-1,1] → uint8
(`unclamp_video`), [C,T,H,W] → [T,H,W,C] permute, 30 fps mp4 via imageio —
with an automatic PNG-frames + .npy fallback when no h264 encoder is
available in the image (this TPU image ships imageio without ffmpeg).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_UINT8_MAX = 255.0


def unclamp_video(video: np.ndarray) -> np.ndarray:
    """[-1, 1] float → uint8 [0, 255] (`decoder.py:33-40`)."""
    v = (np.asarray(video, np.float32) + 1.0) / 2.0
    v = np.clip(v, 0.0, 1.0)
    return (v * _UINT8_MAX + 0.5).astype(np.uint8)


def to_frames(video_cthw: np.ndarray) -> np.ndarray:
    """[C, T, H, W] → [T, H, W, C] uint8."""
    return unclamp_video(np.transpose(video_cthw, (1, 2, 3, 0)))


def save_video(video_cthw: np.ndarray, path: str, name: str,
               fps: int = 30) -> str:
    """Write mp4 (h264) if an encoder exists; otherwise PNG frames + .npy.

    Returns the written path (mp4 file or frames directory)."""
    os.makedirs(path, exist_ok=True)
    frames = to_frames(video_cthw)
    mp4_path = os.path.join(path, f"{name}.mp4")
    try:
        import imageio

        imageio.mimsave(mp4_path, list(frames), fps=fps, codec="h264")
        return mp4_path
    except Exception as e:
        logger.warning("mp4 encode unavailable (%s); writing PNG frames", e)
        frame_dir = os.path.join(path, name)
        os.makedirs(frame_dir, exist_ok=True)
        np.save(os.path.join(frame_dir, "video.npy"), frames)
        try:
            import imageio

            for i, frame in enumerate(frames):
                imageio.imwrite(os.path.join(frame_dir, f"{i:05d}.png"), frame)
        except Exception:
            pass
        return frame_dir


def save_latents_to_video(latents, decoder_params, decoder_cfg, path: str,
                          name: str, fps: int = 30,
                          chunk_frames: Optional[int] = 4,
                          context_frames: int = 2) -> str:
    """`save_tensor_to_mp4` analog (`decoder.py:43-53`): decode then write.
    Decodes in causal temporal chunks by default so long/high-res videos fit
    HBM (see models/cosmos_vae.py:decode_video)."""
    from video_diffusion_speedrun_tpu.models.cosmos_vae import decode_video

    video = decode_video(decoder_params, decoder_cfg, latents,
                         chunk_frames=chunk_frames,
                         context_frames=context_frames)
    return save_video(np.asarray(video, np.float32), path, name, fps)
