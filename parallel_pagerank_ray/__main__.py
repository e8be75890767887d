from parallel_pagerank_ray.cli import main

raise SystemExit(main())
