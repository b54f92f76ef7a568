"""Demo entry point — test.py with the val phase (reference demo.py:9-20):
writes vis/ref/gt/all panels for quick qualitative inspection.
"""

from __future__ import annotations

import sys


def main():
    # demo = test with phase val + save_input semantics
    if "--phase" not in " ".join(sys.argv):
        sys.argv += ["--phase", "val"]
    import test as test_entry

    test_entry.main()


if __name__ == "__main__":
    main()
