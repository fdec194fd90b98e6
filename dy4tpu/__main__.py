import sys

from dy4tpu.app import main

sys.exit(main())
