from cg_mrslam_tpu.cli import main

raise SystemExit(main())
