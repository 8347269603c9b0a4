"""Raw-image end-to-end seam (VERDICT r3 next #8): images ->
extract_features CLI -> train.py -> serving.caption_images, driven as ONE
pipeline by scripts/raw_image_demo.py.  Micro scale so CI stays fast; the
script defaults are the demo scale."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_raw_image_demo_end_to_end(tmp_path):
    work = tmp_path / "raw"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "raw_image_demo.py"),
         str(work), "--n-images", "48", "--epochs", "8",
         "--platform", "cpu"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}"

    # artifacts: features, checkpoints, captions
    feats = os.listdir(work / "features")
    assert len(feats) == 48 and all(f.endswith(".npy") for f in feats)
    run_dir = work / "runs" / "raw_image_demo"
    assert (run_dir / "vocab.bin").exists()
    assert (run_dir / "test_results.json").exists()
    captions = json.load(open(work / "captions.json"))
    assert len(captions) == 8  # test split of 48 images
    # the script itself exits 1 on empty captions; double-check anyway
    for path, cap in captions.items():
        assert isinstance(cap, str) and cap.strip(), (path, cap)
