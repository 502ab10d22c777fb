from yolov8_vit_tpu.data.voc import (  # noqa: F401
    generate_annotation, indent, parse_voc_xml, scan_xml_dirs,
    convert_box_cxcywh, xml2txt, deliver, yolo2dict,
)
