#!/usr/bin/env python3
"""Synthetic herbivore/carnivore dataset generator (original implementation;
same schema and distribution as the reference's examples/ffm/generate.py so
results are comparable): animals eat compatible foods (herbivore→plant,
carnivore→meat → label 1, else −1). The train set only ever shows an animal
or a food from the "common" quarter of the vocabulary; test-hard.vw pairs
only unseen combinations, so beating 0.5 balanced accuracy there requires
actual latent factors (the FFM), not memorized pairs."""

import argparse
import random
from pathlib import Path


def render(kind_a, name_a, kind_b, name_b):
    label = 1 if (kind_a, kind_b) in ((0, 0), (1, 1)) else -1
    animal = ("Herbivore" if kind_a == 0 else "Carnivore") + f"-{name_a}"
    food = ("Plant" if kind_b == 0 else "Meat") + f"-{name_b}"
    return f"{label} |A {animal} |B {food}\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_animals", type=int, default=300)
    ap.add_argument("--num_foods", type=int, default=200)
    ap.add_argument("--num_train_examples", type=int, default=30000)
    ap.add_argument("--num_test_examples", type=int, default=10000)
    ap.add_argument("--block_beyond", type=int, default=3,
                    help="size of the 'common' id block train pairs anchor on")
    ap.add_argument("--out", default="datasets")
    args = ap.parse_args()

    rng = random.Random(1)
    out = Path(args.out)
    out.mkdir(exist_ok=True)
    (out / "vw_namespace_map.csv").write_text("A,animal\nB,food\n")

    a_block = b_block = args.block_beyond

    def common_pair():
        ka, kb = rng.randint(0, 1), rng.randint(0, 1)
        if rng.randint(0, 1):
            return ka, rng.randint(0, args.num_animals), kb, rng.randint(0, b_block)
        return ka, rng.randint(0, a_block), kb, rng.randint(0, args.num_foods)

    with open(out / "train.vw", "w") as f:
        for _ in range(args.num_train_examples):
            f.write(render(*common_pair()))
    with open(out / "test-easy.vw", "w") as f:
        for _ in range(args.num_test_examples):
            f.write(render(*common_pair()))
    with open(out / "test-hard.vw", "w") as f:
        for _ in range(args.num_test_examples):
            f.write(render(
                rng.randint(0, 1), rng.randint(a_block + 1, args.num_animals),
                rng.randint(0, 1), rng.randint(b_block + 1, args.num_foods),
            ))
    print(f"wrote {args.out}/train.vw, test-easy.vw, test-hard.vw")


if __name__ == "__main__":
    main()
