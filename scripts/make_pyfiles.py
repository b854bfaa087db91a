#!/usr/bin/env python
"""Package mdq_spark for ``spark-submit --py-files`` (north rule: ships
as a spark-submit --py-files job).  Writes dist/mdq_spark.zip."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "mdq_spark.zip")
    pkg = os.path.join(REPO, "mdq_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    print(out)


if __name__ == "__main__":
    main()
