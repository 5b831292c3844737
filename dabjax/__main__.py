import sys

from dabjax.cli import main

sys.exit(main())
