from ntt_aie_tpu.cli import main

import sys

sys.exit(main())
