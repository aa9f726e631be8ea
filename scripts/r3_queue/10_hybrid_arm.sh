#!/bin/bash
exec bash scripts/r3_hybrid_arm.sh
