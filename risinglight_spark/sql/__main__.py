import sys

from risinglight_spark.sql.shell import main

sys.exit(main())
