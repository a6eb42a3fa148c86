import sys

from mini_parallel_tpu.cli import main

sys.exit(main())
