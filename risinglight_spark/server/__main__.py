import sys

from risinglight_spark.server.pgwire import main

sys.exit(main())
