"""PST900 improved-training entry point (reference `train_pst900_improved.py`).

The improvements (data-driven class weights, AdamW 5e-5 + poly LR, improved
loss with dice, grad-clip 1.0) live in train_segmentation.py and activate
automatically for --dataset pst900; this entry preserves the reference's
dedicated CLI name."""
import sys

from train_segmentation import main

if __name__ == "__main__":
    if "--dataset" not in sys.argv:
        sys.argv += ["--dataset", "pst900"]
    main()
