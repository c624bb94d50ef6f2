from raytracing_tpu.app import main

main()
