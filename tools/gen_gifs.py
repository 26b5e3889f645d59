"""Generate docs GIFs from rendered rollouts (the analogue of the reference's
docs/_scripts/gen_gifs.py): one GIF per family representative under
docs/_gifs/. Pure CPU; uses the in-repo software renderer."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

FAMILY_GIFS = [
    ("PointMaze_UMaze-v3", 40),
    ("AntMaze_UMaze-v5", 30),
    ("FetchPickAndPlace-v4", 25),
    ("HandManipulateBlockRotateXYZ-v1", 20),
    ("AdroitHandDoor-v1", 25),
    ("FrankaKitchen-v1", 12),
    ("HalfCheetah-v5", 30),
]


def write_gif(path, frames, fps):
    try:
        import imageio

        imageio.mimsave(path, frames, fps=fps, loop=0)
        return True
    except ImportError:
        # minimal uncompressed GIF writer fallback is out of scope; ship pngs
        try:
            from PIL import Image

            imgs = [Image.fromarray(f) for f in frames]
            imgs[0].save(
                path, save_all=True, append_images=imgs[1:],
                duration=int(1000 / fps), loop=0,
            )
            return True
        except ImportError:
            np.savez_compressed(path + ".npz", frames=np.stack(frames))
            return False


def main(only=None):
    from gymnasium_robotics_tpu import registry

    out_dir = os.path.join("docs", "_gifs")
    os.makedirs(out_dir, exist_ok=True)
    for env_id, steps in FAMILY_GIFS:
        if only and env_id not in only:
            continue
        env = registry.make_gym(env_id)
        env.render_mode = "rgb_array"
        env.reset(seed=7)
        frames = [env.render()]
        rng = np.random.default_rng(0)
        for _ in range(steps):
            a = rng.uniform(-1, 1, env.action_space.shape).astype(np.float32)
            env.step(a)
            frames.append(env.render())
        fps = env.metadata.get("render_fps", 25)
        path = os.path.join(out_dir, env_id.split("-")[0] + ".gif")
        ok = write_gif(path, frames, min(fps, 25))
        print(f"{env_id}: {len(frames)} frames -> {path} ({'gif' if ok else 'npz'})")


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
