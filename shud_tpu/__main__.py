from shud_tpu.cli import main

main()
