#!/bin/bash
exec bash scripts/r3_hybrid_1152.sh
