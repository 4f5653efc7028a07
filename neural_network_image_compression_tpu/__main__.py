from neural_network_image_compression_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
