"""Convert bundled Tombo HDF5 k-mer models (calibration data assets) into
the native tombo_tpu .npz format.  Usage:
    python scripts/convert_reference_models.py <src_dir> [dst_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tombo_tpu.io.model_io import AltModel, KmerModel  # noqa: E402

CANONICAL = {"tombo.DNA.model", "tombo.RNA.180mV.model",
             "tombo.RNA.200mV.model"}


def main(src_dir, dst_dir):
    os.makedirs(dst_dir, exist_ok=True)
    for fn in sorted(os.listdir(src_dir)):
        if not fn.endswith(".model"):
            continue
        src = os.path.join(src_dir, fn)
        dst = os.path.join(dst_dir, fn + ".npz")
        if fn in CANONICAL:
            m = KmerModel.load(src)
            m.save_npz(dst)
            print("canonical", fn, "k=%d central=%d" %
                  (m.kmer_width, m.central_pos))
        else:
            m = AltModel.load(src)
            m.save_npz(dst)
            print("alt      ", fn, "k=%d central=%d alt=%s motif=%s/%s" %
                  (m.kmer_width, m.central_pos, m.alt_base,
                   m.motif.raw_motif, m.motif.mod_pos))


if __name__ == "__main__":
    src = sys.argv[1]
    dst = (sys.argv[2] if len(sys.argv) > 2 else
           os.path.join(os.path.dirname(__file__), "..", "tombo_tpu",
                        "models"))
    main(src, dst)
