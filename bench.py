"""Driver bench entry point (thin shim).

The implementation lives in ``grandtpu.bench.driver`` so the installed
package (and ``grandtpu bench spmm``) can run it from any cwd; this file
stays at the repo root because the driver invokes ``python bench.py``.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from grandtpu.bench.driver import main

if __name__ == "__main__":
    main()
