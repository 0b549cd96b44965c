from pcmi_tpu.cli import main

raise SystemExit(main())
