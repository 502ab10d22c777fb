"""End-to-end smoke script — `test.py` parity (`/root/reference/test.py`).

Loads a detect engine + classify engine, runs the two-stage `main` over an
image directory, and writes VOC prediction XMLs via the
`generate_annotation` callback (model-assisted labeling).

    python examples/smoke.py --detect-engine weights/detect_engine \
        --classify-engine weights/class_engine --images ./image/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detect-engine", required=True)
    ap.add_argument("--classify-engine", default=None)
    ap.add_argument("--images", required=True)
    ap.add_argument("--out-xml", default="predictions/")
    ap.add_argument("--draw-dir", default=None)
    args = ap.parse_args()

    from yolov8_vit_tpu.data.voc import generate_annotation
    from yolov8_vit_tpu.runtime.engine import Engine
    from yolov8_vit_tpu.serve.infer import main as infer_main
    from yolov8_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    engine = Engine(args.detect_engine)
    engine.set_desired(["num_dets", "bboxes", "scores", "labels"])
    model_list = []
    if args.classify_engine:
        model_list.append(Engine(args.classify_engine))

    def func(folder, filename, path, objects):
        generate_annotation(folder, filename, path, objects,
                            save_dir=args.out_xml)

    results = infer_main(engine, args.images, model_list=model_list,
                         func=func, save_draw_dir=args.draw_dir)
    for row in results:
        print(row)
    print(f"{len(results)} detections across "
          f"{len(set(r[0] for r in results))} images; "
          f"XMLs in {args.out_xml}")


if __name__ == "__main__":
    main()
