import sys

from spmv_tpu.cli import main

sys.exit(main())
