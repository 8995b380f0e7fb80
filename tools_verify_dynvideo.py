"""Drive load_video_dynamic + the dataset's dynamic_video_sampling flag
through the public package boundary (plain python, default backend)."""
import numpy as np, tempfile, os
from memory_augmented_vlm_tpu.data import video
with tempfile.TemporaryDirectory() as d:
    frames = np.random.default_rng(0).integers(0, 255, (250, 8, 8, 3), dtype=np.uint8)
    p = os.path.join(d, "v.npy"); np.save(p, frames)
    out, t, times, num = video.load_video_dynamic(p, video_fps=1)
    print("dynamic:", out.shape, t, num, times.split(",")[:3])
    out2, t2, _, num2 = video.load_video(p, video_fps=1)
    print("n*32 rule:", out2.shape, num2)
    assert num == 250 and num2 == 224  # 1fps source: ladder keeps all, n*32 cuts
