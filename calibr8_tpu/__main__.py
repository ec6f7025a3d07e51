import sys

from calibr8_tpu.cli.main import main

sys.exit(main())
