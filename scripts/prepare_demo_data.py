"""Stage the reference repo's bundled example images as a places2-style
training tree for the training demonstration run
(configs/experiment/demo_places128.yaml).

    python scripts/prepare_demo_data.py [--reference /root/reference] \
        [--out data/Places2-demo]

Uses only the Places2 suites (36 images; reference examples/ directory,
README.md:56-86) — the FFHQ faces are a different domain and would muddy
the tiny-data demo. Images are copied as-is; the dataset's loader chain
does the resizing (FreeFormMaskFormatter bicubic to the training res).
"""

import argparse
import shutil
from pathlib import Path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reference", type=Path, default=Path("/root/reference"))
    p.add_argument("--out", type=Path, default=Path("data/Places2-demo"))
    args = p.parse_args()

    suites = ["places2_256_freeform", "places2_512_freeform",
              "places2_512_object"]
    dst = args.out / "train_256" / "examples"
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    seen = set()
    for suite in suites:
        src = args.reference / "examples" / suite / "images"
        if not src.is_dir():
            print(f"skip {suite}: {src} not found")
            continue
        for img in sorted(src.iterdir()):
            if img.suffix.lower() not in (".jpg", ".jpeg", ".png"):
                continue
            if img.name in seen:      # suites share some Places2 val images
                continue
            seen.add(img.name)
            shutil.copy2(img, dst / img.name)
            n += 1
    print(f"staged {n} images -> {dst}")


if __name__ == "__main__":
    main()
