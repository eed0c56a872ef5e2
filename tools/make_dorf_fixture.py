"""Generate tests/fixtures/dorfCurves.txt.gz — a 201-curve stand-in for the
real DoRF database in its EXACT text format, so the real parser path
(skyhdr.utils.io.load_dorf_curves, reference utils.py:105-116) is exercised
end-to-end even though the real file is user-supplied (gitignored in the
reference, .gitignore:132).

Record format (6 lines per curve, the reference reads line idx+5):
    <curve name>
    <curve info>
    I =
    <1024 space-separated irradiance samples (linspace 0..1)>
    B =
    <1024 space-separated brightness samples (the CRF, 0..1 monotone)>

201 curves match the real database's count: the reference splits the first
175 into the train bank and the remaining 26 into the test bank
(utils.py:111-114), and both banks must be non-empty for the training and
eval degradation pipelines.
"""

import gzip
import os

import numpy as np

K = 1024
N = 201


def make_curves(n=N, k=K, seed=7):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 1.0, k)
    curves = []
    for _ in range(n):
        g = rng.uniform(0.3, 3.0)
        a = rng.uniform(0.0, 1.0)
        s = x * x * (3 - 2 * x)
        c = (1 - a) * np.power(x, g) + a * s
        c = (c - c[0]) / (c[-1] - c[0])
        curves.append(c)
    return np.asarray(curves)


def main(out="tests/fixtures/dorfCurves.txt.gz"):
    os.makedirs(os.path.dirname(out), exist_ok=True)
    x = np.linspace(0.0, 1.0, K)
    lines = []
    for i, crf in enumerate(make_curves()):
        lines.append(f"synth_fixture_curve_{i:03d}")
        lines.append("synthetic gamma/smoothstep mixture")
        lines.append("I = ")
        lines.append(" ".join(f"{v:.5f}" for v in x))
        lines.append("B = ")
        lines.append(" ".join(f"{v:.5f}" for v in crf))
    with gzip.open(out, "wt") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
